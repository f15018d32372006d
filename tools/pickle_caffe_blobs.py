#!/usr/bin/env python
"""Convert a Caffe .caffemodel (e.g. VGG_ILSVRC_16_layers.caffemodel) into
the framework's pkl weight format.

Capability parity with ``tools/pickle_caffe_blobs.py`` (used by
``scripts/convert_vgg16.sh`` to produce ``VGG_ILSVRC_16_layers_v1.pkl``).
The reference depends on the Caffe protobuf python bindings; this version
ships a minimal protobuf wire-format reader for NetParameter instead — it
understands both the V1 (``layers``, field 2) and modern (``layer``, field
100) layer lists, reading each layer's name and BlobProto weights.

Blob naming follows the reference: layer 'conv1_1' with two blobs becomes
'conv1_1_w' (+ '_b'). FC blobs keep Caffe's (out, in) layout — the same
layout ``utils/checkpoint.py`` translates on load.

Usage: python tools/pickle_caffe_blobs.py <model.caffemodel> <out.pkl>
"""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import save_object


# ---------------------------------------------------------------------------
# Minimal protobuf wire reader
# ---------------------------------------------------------------------------

def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message.
    value: varint int, 8-byte bytes, length-delimited bytes, or 4-byte bytes.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:    # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError('unsupported wire type {}'.format(wire))
        yield field, wire, val


def _parse_blob(buf):
    """BlobProto: shape=7 (BlobShape: dim=1 repeated int64), data=5 (repeated
    float, usually packed), legacy num/channels/height/width = 1..4."""
    dims = []
    legacy = {}
    data_chunks = []
    for field, wire, val in _iter_fields(buf):
        if field == 7 and wire == 2:  # BlobShape
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1:
                    if w2 == 2:  # packed varints
                        p = 0
                        while p < len(v2):
                            d, p = _read_varint(v2, p)
                            dims.append(d)
                    else:
                        dims.append(v2)
        elif field == 5:  # data
            if wire == 2:  # packed floats
                data_chunks.append(np.frombuffer(val, dtype='<f4'))
            elif wire == 5:
                data_chunks.append(
                    np.frombuffer(val, dtype='<f4'))
        elif field in (1, 2, 3, 4) and wire == 0:
            legacy[field] = val
    data = (np.concatenate(data_chunks) if data_chunks
            else np.zeros((0,), np.float32))
    if not dims and legacy:
        dims = [legacy.get(i, 1) for i in (1, 2, 3, 4)]
    if dims and int(np.prod(dims)) == data.size:
        data = data.reshape(dims)
        # squeeze legacy num/channels/height/width padding: fc blobs
        # (1, 1, out, in) -> (out, in) AND biases (1, 1, 1, n) -> (n,) —
        # stopping at 2-D left biases as (1, n), which the checkpoint
        # loader transposes like an fc weight and then rejects
        while data.ndim > 1 and data.shape[0] == 1:
            data = data[0]
    return data


def _parse_layer(buf, v1):
    """LayerParameter (name=1, blobs=7) or V1LayerParameter (name=4,
    blobs=6)."""
    name_field = 4 if v1 else 1
    blobs_field = 6 if v1 else 7
    name = None
    blobs = []
    for field, wire, val in _iter_fields(buf):
        if field == name_field and wire == 2:
            name = val.decode('utf-8', 'replace')
        elif field == blobs_field and wire == 2:
            blobs.append(_parse_blob(val))
    return name, blobs


def parse_caffemodel(path):
    """NetParameter: layers(V1)=2, layer=100. Returns {layer_name: [blobs]}."""
    with open(path, 'rb') as f:
        buf = f.read()
    out = {}
    for field, wire, val in _iter_fields(buf):
        if wire != 2:
            continue
        if field in (2, 100):
            name, blobs = _parse_layer(val, v1=(field == 2))
            if name and blobs:
                out[name] = blobs
    return out


def main():
    if len(sys.argv) != 3 or sys.argv[1] in ('-h', '--help'):
        print('usage: pickle_caffe_blobs.py <model.caffemodel> <out.pkl>')
        sys.exit(0 if '-h' in sys.argv or '--help' in sys.argv else 1)
    src, dst = sys.argv[1], sys.argv[2]
    layers = parse_caffemodel(src)
    blobs = {}
    for name, layer_blobs in layers.items():
        suffixes = ['_w', '_b'] + ['_blob{}'.format(i)
                                   for i in range(2, len(layer_blobs))]
        for blob, suffix in zip(layer_blobs, suffixes):
            blobs[name + suffix] = np.asarray(blob, np.float32)
            print('{}{}: {}'.format(name, suffix, blobs[name + suffix].shape))
    save_object({'blobs': blobs}, dst)
    print('Wrote {} blobs to {}'.format(len(blobs), dst))


if __name__ == '__main__':
    main()
