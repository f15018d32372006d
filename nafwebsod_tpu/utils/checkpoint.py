"""Checkpoint I/O — preserves the reference's public pkl weight format.

Capability parity with ``detectron/utils/net_wsl.py``:

  * pkl schema: ``{'blobs': {unscoped_name: ndarray}, 'cfg': yaml_str}`` with
    ``<param>_momentum`` entries and ``__preserve__/``-prefixed passthrough
    blobs (net_wsl.py:140-180).
  * load aliasing: a param named ``'_[tag]_foo'`` is initialized from blob
    ``foo`` when its own name is missing — this is how the noisy fc6/fc7
    tower shares the clean VGG fc6/fc7 init (net_wsl.py:79-87, names minted
    at webly_heads.py:492-498).
  * shape checking on load (net_wsl.py:102-111).

Layout translation at the boundary (internal arrays are TPU layouts):
  conv weights  pkl OIHW  <->  internal HWIO
  fc weights    pkl (out, in)  <->  internal (in, out)
Biases and other 1-D blobs pass through unchanged.
"""

import logging
import os
import re

import numpy as np

from nafwebsod_tpu.utils import io as io_utils

logger = logging.getLogger(__name__)

_ALIAS_RE = re.compile(r'^_\[.*\]_')


def _pkl_to_internal(name, arr):
    if arr.ndim == 4:
        return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    if arr.ndim == 2:
        return np.ascontiguousarray(arr.T)                       # (o,i) -> (i,o)
    return arr


def _internal_to_pkl(name, arr):
    arr = np.asarray(arr)
    if arr.ndim == 4:
        return np.ascontiguousarray(arr.transpose(3, 2, 0, 1))  # HWIO -> OIHW
    if arr.ndim == 2:
        return np.ascontiguousarray(arr.T)
    return arr


def unscope_name(name):
    """Strip a 'gpu_<i>/' device scope if present (reference blob names)."""
    return name.split('/')[-1] if name.startswith('gpu_') else name


def load_weights_pkl(path):
    """Read a reference-format pkl; returns (blobs_dict_pkl_layout, saved_cfg)."""
    data = io_utils.load_object(path)
    if isinstance(data, dict) and 'blobs' in data:
        return data['blobs'], data.get('cfg', None)
    return data, None


def initialize_params_from_weights_file(params, path, strict_shapes=True):
    """Fill the internal param dict from a pkl checkpoint.

    Returns (new_params, momentum_dict, unmatched_names). Momentum entries are
    returned in internal layout keyed by param name.
    """
    blobs, _ = load_weights_pkl(path)
    blobs = {unscope_name(k): v for k, v in blobs.items()}
    new_params = dict(params)
    momentum = {}
    unmatched = []
    for name, cur in params.items():
        src_name = name
        if src_name not in blobs and _ALIAS_RE.match(src_name):
            # shared-init alias: '_[noisy]_fc6_w' -> 'fc6_w'
            src_name = _ALIAS_RE.sub('', src_name)
        if src_name not in blobs:
            unmatched.append(name)
            continue
        arr = _pkl_to_internal(name, np.asarray(blobs[src_name]))
        if tuple(arr.shape) != tuple(np.shape(cur)):
            msg = 'Shape mismatch for {}: checkpoint {} vs model {}'.format(
                name, arr.shape, np.shape(cur))
            if strict_shapes:
                raise ValueError(msg)
            logger.warning(msg)
            unmatched.append(name)
            continue
        new_params[name] = arr.astype(np.asarray(cur).dtype)
        mom_name = name + '_momentum'
        src_mom = src_name + '_momentum'
        if src_mom in blobs and src_name == name:
            momentum[name] = _pkl_to_internal(name, np.asarray(blobs[src_mom]))
    if unmatched:
        logger.info('Params not found in %s: %s', path, unmatched)
    return new_params, momentum, unmatched


def save_params_to_weights_file(path, params, momentum=None, cfg_yaml=None,
                                preserve=None):
    """Write the reference-format pkl: blobs + momentum + cfg (net_wsl.py:140)."""
    blobs = {}
    for name, arr in params.items():
        blobs[name] = _internal_to_pkl(name, arr)
    if momentum:
        for name, arr in momentum.items():
            blobs[name + '_momentum'] = _internal_to_pkl(name, arr)
    if preserve:
        for name, arr in preserve.items():
            blobs['__preserve__/' + name] = np.asarray(arr)
    out = {'blobs': blobs}
    if cfg_yaml is not None:
        out['cfg'] = cfg_yaml
    io_utils.save_object(out, path)


def print_net(params, logger_fn=None):
    """Dump the param table with shapes/stats — the functional analogue of
    ``net_wsl.print_net:223-270`` (the reference prints the op list with live
    blob shapes at iter 0)."""
    out = logger_fn or logger.info
    total = 0
    for name in sorted(params):
        arr = np.asarray(params[name])
        total += arr.size
        out('%-40s %-18s mean %+.4e std %.4e', name, str(arr.shape),
            float(arr.mean()) if arr.size else 0.0,
            float(arr.std()) if arr.size else 0.0)
    out('total parameters: %.2fM', total / 1e6)


def find_checkpoint_for_resume(output_dir):
    """AUTO_RESUME scan (train_wsl.py:121-160): returns (path, start_iter) for
    the newest model_iter<N>.pkl, or (model_final, None) if training finished,
    or (None, 0)."""
    final_path = os.path.join(output_dir, 'model_final.pkl')
    if os.path.exists(final_path):
        return final_path, None
    best_iter, best_path = -1, None
    if os.path.isdir(output_dir):
        for fname in os.listdir(output_dir):
            m = re.match(r'^model_iter(\d+)\.pkl$', fname)
            if m and int(m.group(1)) > best_iter:
                best_iter = int(m.group(1))
                best_path = os.path.join(output_dir, fname)
    if best_path is None:
        return None, 0
    return best_path, best_iter + 1
