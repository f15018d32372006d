#!/usr/bin/env python
"""Test with detection rendering enabled.

Capability parity with ``tools/test_net_wsl_vis.py``: identical to
test_net.py but with cfg.VIS forced on (the reference swaps in
test_engine_wsl_vis, whose difference is rendering each image's detections
while evaluating)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import test_net  # noqa: E402


def main():
    orig = test_net.parse_args

    def patched():
        args = orig()
        args.vis = True
        return args

    test_net.parse_args = patched
    test_net.main()


if __name__ == '__main__':
    main()
