#!/usr/bin/env bash
# Test wrapper with logging (scripts/test_wsl.sh analogue).
set -u

if [ $# -lt 1 ]; then
    echo "usage: $0 <cfg.yaml> [KEY VALUE ...]" >&2
    exit 1
fi

CFG="$1"; shift
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
SLUG="$(echo "${CFG} $*" | tr ' /' '__' | tr -cd 'a-zA-Z0-9_.-' | cut -c1-180)"
LOG_DIR="${LOG_DIR:-${REPO_DIR}/logs}"
mkdir -p "${LOG_DIR}"
LOG="${LOG_DIR}/test_${SLUG}_$(date +%Y%m%d_%H%M%S).log"

python "${REPO_DIR}/tools/test_net.py" --cfg "${CFG}" "$@" 2>&1 | tee "${LOG}"
exit "${PIPESTATUS[0]}"
