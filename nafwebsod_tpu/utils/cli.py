"""Shared CLI plumbing for the ``tools/`` entry points.

Every reference tool repeats the same prologue by hand (print usage when
invoked bare, merge ``--cfg`` then trailing ``KEY VALUE`` opts, finalize
with ``assert_and_infer_cfg`` — e.g. ``tools/train_net_wsl.py:60-75``);
here it is one helper the tools share.
"""

import sys

from nafwebsod_tpu.core.config import (assert_and_infer_cfg,
                                       merge_cfg_from_file,
                                       merge_cfg_from_list)


def parse_or_usage(parser, argv=None):
    """Parse CLI args; a bare invocation prints usage and exits 1 (the
    reference tools' convention)."""
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args(argv)


def configure_from_args(args, infer=True):
    """Apply ``--cfg`` and trailing ``KEY VALUE`` opts to the global cfg,
    then (by default) finalize it. Missing attributes are simply skipped,
    so tools with partial surfaces can share this."""
    cfg_file = getattr(args, 'cfg_file', None)
    if cfg_file is not None:
        merge_cfg_from_file(cfg_file)
    opts = getattr(args, 'opts', None)
    if opts:
        merge_cfg_from_list(opts)
    if infer:
        assert_and_infer_cfg()
