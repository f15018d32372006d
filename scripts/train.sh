#!/usr/bin/env bash
# Train wrapper: slugged log file, tee, git-sha logging, post-train curve
# plot. Capability parity with scripts/train_wsl.sh (reference :1-57).
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
LOG="${LOG_DIR}/train_${SLUG}_$(date +%Y%m%d_%H%M%S).log"

{
    echo "git-sha: $(git -C "${REPO_DIR}" rev-parse HEAD 2>/dev/null || echo unknown)"
    echo "cfg: ${CFG}"
    echo "opts: $*"
} | tee "${LOG}"

python "${REPO_DIR}/tools/train_net.py" --cfg "${CFG}" "$@" 2>&1 | tee -a "${LOG}"
STATUS=${PIPESTATUS[0]}

# post-train learning-curve plot (train_wsl.sh:44-48)
python "${REPO_DIR}/tools/visualize_learn.py" "${LOG}" \
    --out "${LOG%.log}_curves.png" || true

exit "${STATUS}"
