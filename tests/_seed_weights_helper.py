"""Subprocess helper: write a well-conditioned seed checkpoint for the
multi-process training equality tests.

Random-init VGG on the synthetic noise fixture saturates the WSDDN head
(image probs at the 1e-20 KLOG clamp), which makes the training
trajectory chaotic: ulp-level differences between the single- and
multi-process XLA executables blow up to O(1) loss differences within
two steps. Scaling the fc towers down moves the head into the
well-conditioned regime (losses of a few nats) where the cross-layout
comparison is meaningful. Run with the same cfg/overrides as the
workers so param shapes match.

Usage: python tests/_seed_weights_helper.py --cfg CFG --out PATH [opts...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['NAFWEBSOD_PLATFORM'] = 'cpu'
from nafwebsod_tpu.utils.env import apply_platform_override  # noqa: E402
apply_platform_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cfg', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--fc-scale', type=float, default=0.05)
    p.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = p.parse_args()

    import jax
    from nafwebsod_tpu.core.config import (assert_and_infer_cfg, cfg,
                                           merge_cfg_from_file,
                                           merge_cfg_from_list)
    merge_cfg_from_file(args.cfg)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg()

    from nafwebsod_tpu.models import detector
    from nafwebsod_tpu.utils import checkpoint

    spec = detector.spec_from_cfg(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    _, init_rng = jax.random.split(rng)
    params = detector.init_params(spec, init_rng)
    towers = ('fc6_w', 'fc7_w', 'fc8c_w', 'fc8d_w')
    params = {k: (v * args.fc_scale if any(t in k for t in towers) else v)
              for k, v in params.items()}
    checkpoint.save_params_to_weights_file(args.out, params)
    print('SEED_WEIGHTS:%s' % args.out)


if __name__ == '__main__':
    main()
