"""Native C++ box-kernel tests: build via make, compare against the numpy
reference implementations (which are themselves golden-tested against the
Cython semantics in test_boxes.py)."""

import numpy as np
import pytest

from nafwebsod_tpu import native
from nafwebsod_tpu.ops import boxes as box_ops


@pytest.fixture(scope='module')
def lib():
    if not native.available():
        pytest.skip('native toolchain unavailable')
    return native.get_lib()


def _dets(seed=0, n=200):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 80, n)
    y1 = rng.uniform(0, 80, n)
    dets = np.stack([x1, y1, x1 + rng.uniform(5, 40, n),
                     y1 + rng.uniform(5, 40, n), rng.rand(n)], 1)
    return dets.astype(np.float32)


class TestNativeBoxOps:
    def test_bbox_overlaps(self, lib):
        rng = np.random.RandomState(1)
        a = _dets(1, 60)[:, :4]
        b = _dets(2, 33)[:, :4]
        got = native.bbox_overlaps(a, b)
        expect = box_ops.bbox_overlaps(a, b)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    def test_nms_matches_numpy(self, lib):
        for seed in range(3):
            dets = _dets(seed)
            for thresh in (0.3, 0.5, 0.7):
                got = native.nms(dets, thresh)
                expect = box_ops._nms_numpy(dets, thresh)
                assert got == list(expect), (seed, thresh)

    def test_soft_nms_matches_numpy(self, lib, monkeypatch):
        for method in ('linear', 'gaussian', 'hard'):
            dets = _dets(3, 80)
            got_dets, got_keep = native.soft_nms(dets.copy(), method=method)
            # numpy path: disable the native dispatch inside boxes.soft_nms
            monkeypatch.setattr(native, 'available', lambda: False)
            exp_dets, exp_keep = box_ops.soft_nms(dets.copy(), method=method)
            monkeypatch.undo()
            assert list(got_keep) == list(exp_keep), method
            np.testing.assert_allclose(got_dets, exp_dets, rtol=1e-4,
                                       atol=1e-5, err_msg=method)
