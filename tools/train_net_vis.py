#!/usr/bin/env python
"""Train with periodic training-sample visualization enabled.

Capability parity with ``tools/train_net_wsl_vis.py``: identical to
train_net.py but with the WSL.SAMPLE dump hooks forced on (the reference
swaps in train_wsl_vis, whose only difference is calling
webly_vis.vis_training every SAMPLE_ITER).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train_net  # noqa: E402
from nafwebsod_tpu.core.config import cfg  # noqa: E402


def main():
    # force the vis hooks on before train_net freezes the config
    orig = train_net.parse_args

    def patched():
        args = orig()
        args.opts = list(args.opts or []) + ['WSL.SAMPLE', 'True']
        return args

    train_net.parse_args = patched
    train_net.main()


if __name__ == '__main__':
    main()
