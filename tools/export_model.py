#!/usr/bin/env python
"""Export the inference model as a serialized StableHLO artifact.

The TPU-native equivalent of ``tools/convert_pkl_to_pb.py`` (which exported
a deploy Caffe2 protobuf): the jitted ``forward_test`` is lowered with
``jax.export`` into a portable StableHLO module that any XLA runtime (TPU
serving, CPU, IREE-style compilers) can load without Python.

Usage:
    python tools/export_model.py --cfg cfg.yaml --wts model_final.pkl \
        --out model.stablehlo [--height 704 --width 704 --rois 2048]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.env import (apply_platform_override,
                                     enable_compilation_cache)

apply_platform_override()  # must run before any jax device query
enable_compilation_cache()  # reruns skip the remote-helper compile wall

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.utils.cli import configure_from_args
from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--wts', dest='weights', required=True)
    parser.add_argument('--out', required=True)
    parser.add_argument('--height', type=int, default=704)
    parser.add_argument('--width', type=int, default=704)
    parser.add_argument('--rois', type=int, default=2048)
    parser.add_argument('--format', choices=('stablehlo', 'savedmodel'),
                        default='stablehlo',
                        help='stablehlo: portable jax.export bytes; '
                             'savedmodel: self-contained TF SavedModel '
                             'directory via jax2tf (weights embedded), for '
                             'TF-Serving infrastructure')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    configure_from_args(args)

    import jax
    import jax.numpy as jnp

    from nafwebsod_tpu.engine.test_engine import initialize_model_from_cfg
    from nafwebsod_tpu.models import detector
    from nafwebsod_tpu.ops import roi_pool as roi_pool_ops

    # custom-call targets (Pallas tpu_custom_call, FFI CPU RoIPool) carry
    # no serialization compatibility guarantee — lower the portable path
    roi_pool_ops.set_portable_ops(True)

    spec, params = initialize_model_from_cfg(args.weights)

    def fn(params, image, rois, obn_scores, valid_mask):
        return detector.forward_test(spec, params, image, rois, obn_scores,
                                     valid_mask)['scores']

    input_shapes = (
        jax.ShapeDtypeStruct((1, args.height, args.width, 3), jnp.float32),
        jax.ShapeDtypeStruct((args.rois, 5), jnp.float32),
        jax.ShapeDtypeStruct((args.rois, 1), jnp.float32),
        jax.ShapeDtypeStruct((args.rois,), jnp.bool_),
    )
    from nafwebsod_tpu.utils import deploy

    if args.format == 'savedmodel':
        deploy.export_tf_savedmodel(fn, params, input_shapes, args.out)
        logger.info('Wrote TF SavedModel to %s '
                    '(in: image %dx%d, %d rois; weights embedded)',
                    args.out, args.height, args.width, args.rois)
        return

    blob, exported = deploy.export_stablehlo(fn, params, input_shapes)
    with open(args.out, 'wb') as f:
        f.write(blob)
    logger.info('Wrote %d bytes of serialized StableHLO to %s '
                '(in: image %dx%d, %d rois; out: %s)',
                len(blob), args.out, args.height, args.width, args.rois,
                exported.out_avals)


if __name__ == '__main__':
    main()
