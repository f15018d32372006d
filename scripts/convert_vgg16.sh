#!/bin/bash
# Convert the ImageNet VGG16 caffemodel into this framework's pkl init
# weights (reference flow: scripts/convert_vgg16.sh — upgrade_net_proto_*
# then tools/pickle_caffe_blobs.py). The upgrade step is unnecessary here:
# tools/pickle_caffe_blobs.py reads BOTH the V1 (`layers`) and modern
# (`layer`) protobuf layouts directly, so the raw download converts as-is.
#
# Usage: scripts/convert_vgg16.sh [caffemodel] [out.pkl]
#   caffemodel  path to VGG_ILSVRC_16_layers.caffemodel
#               (default: models/VGG/VGG_ILSVRC_16_layers.caffemodel)
#   out.pkl     output path the shipped configs' TRAIN.WEIGHTS points at
#               (default: models/VGG/VGG_ILSVRC_16_layers_v1.pkl)
set -e
set -x

REPO="$(cd "$(dirname "$0")/.." && pwd)"
CAFFEMODEL="${1:-$REPO/models/VGG/VGG_ILSVRC_16_layers.caffemodel}"
OUT="${2:-$REPO/models/VGG/VGG_ILSVRC_16_layers_v1.pkl}"

if [ ! -f "$CAFFEMODEL" ]; then
    echo "caffemodel not found: $CAFFEMODEL" >&2
    echo "download: https://www.robots.ox.ac.uk/~vgg/software/very_deep/caffe/VGG_ILSVRC_16_layers.caffemodel" >&2
    exit 1
fi

mkdir -p "$(dirname "$OUT")"
python "$REPO/tools/pickle_caffe_blobs.py" "$CAFFEMODEL" "$OUT"

# sanity: the pkl must load through the framework's checkpoint reader
python - "$REPO" "$OUT" <<'EOF'
import sys
sys.path.insert(0, sys.argv[1])
from nafwebsod_tpu.utils.io import load_object
blobs = load_object(sys.argv[2])
blobs = blobs.get('blobs', blobs)
need = ['conv1_1_w', 'conv5_3_w', 'fc6_w', 'fc7_w']
missing = [k for k in need if k not in blobs]
assert not missing, 'converted pkl is missing %s' % missing
print('ok: %d blobs, fc6_w %s' % (len(blobs), blobs['fc6_w'].shape))
EOF
