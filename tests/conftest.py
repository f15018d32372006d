import os
import sys

# Multi-device tests run on a virtual 8-device CPU mesh (SURVEY.md §4).
# The axon environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests must
# not touch the single real chip, so force the CPU backend explicitly.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------- #
# Test tiers: `pytest -m smoke` = the fast pass with every subsystem
# represented (config / data / ops / kernels / models / solver / parallel /
# multihost / engine-eval / checkpoint / vis); the unmarked remainder is
# the full tier (bound full runs at 5400s on this 1-core box). Whole fast
# files are tiered here rather than per-test decorators so the list stays
# in one place. Measured round 5 (quiet 1-core box): 4:23 for 167 tests;
# the pytest_sessionfinish hook below FAILS a passing smoke run that
# exceeds NAFWEBSOD_SMOKE_BUDGET_S (default 420 = 1.5x measured).
SMOKE_FILES = {
    'test_config.py',        # config system
    'test_data.py',          # json_dataset/roidb
    'test_boxes.py',         # box ops + native nms
    'test_ops.py',           # loss/misc ops
    'test_native.py',        # C++ FFI ops
    'test_pallas_interpret.py',  # Pallas kernels (interpreter mode)
    'test_context.py',       # context head ops
    'test_center.py',        # center loss
    'test_refine.py',        # OICR/PCL/C-MIL ladders
    'test_image_prep.py',    # device image prep
    'test_solver.py',        # Caffe SGD semantics
    'test_parallel.py',      # DP train step + mesh
    'test_multihost.py',     # multi-controller branches
    'test_eval_tasks.py',    # evaluators (VOC/COCO/cityscapes)
    'test_golden_parity.py',  # checkpoint pkl round-trips
    'test_vis.py',           # visualization paths
}

# Per-test smoke picks: the sharded training steps and the inference
# engine are too slow as whole files for the <5-min tier, but each gets
# its cheapest representative test (round-4: fast signal for the
# subsystems most likely to break). Keyed by (file, test-name prefix).
SMOKE_TESTS = {
    # train loop: one full e2e pick (the whole file is ~75s — the resume/
    # prefetch variants stay full-tier)
    ('test_train.py', 'TestTrainModel::test_loop_and_snapshots'),
    ('test_zero.py', 'test_zero_momentum_is_sharded'),
    ('test_pipeline.py', 'test_pipeline_step_matches_mean_loss_step'),
    ('test_tensor_shard.py', 'test_tp_step_matches_unsharded'),
    ('test_roi_shard.py', 'test_sharded_forward_matches_unsharded'),
    ('test_engine.py', 'TestNmsAndLimit'),
    ('test_engine.py', 'TestFusedDetect::test_fused_matches_two_call_path'),
}


# Smoke-tier wall-clock budget (VERDICT r4: the tier's purpose eroded a
# minute per round with nothing enforcing it). When a `-m smoke` run
# passes but exceeds the budget, the session FAILS loudly — demote the
# slowest file (move it out of SMOKE_FILES, keep a SMOKE_TESTS pick) or
# raise NAFWEBSOD_SMOKE_BUDGET_S deliberately. Budget default = 1.5x the
# measured quiet-box time, absorbing CPU-contention jitter.
_SMOKE_T0 = None


def pytest_configure(config):
    global _SMOKE_T0
    import time
    _SMOKE_T0 = time.time()


def pytest_sessionfinish(session, exitstatus):
    import time
    markexpr = str(session.config.getoption('markexpr') or '')
    if markexpr != 'smoke' or exitstatus != 0 or _SMOKE_T0 is None:
        return
    elapsed = time.time() - _SMOKE_T0
    budget = float(os.environ.get('NAFWEBSOD_SMOKE_BUDGET_S', '420'))
    if elapsed > budget:
        print('\nSMOKE BUDGET EXCEEDED: %.0fs > %.0fs '
              '(NAFWEBSOD_SMOKE_BUDGET_S) — if the box was contended '
              '(concurrent TPU compile/bench), rerun quiet; otherwise '
              'demote the slowest smoke file in tests/conftest.py or '
              'raise the budget deliberately' % (elapsed, budget))
        session.exitstatus = 1


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in SMOKE_FILES:
            item.add_marker(_pytest.mark.smoke)
            continue
        for f, prefix in SMOKE_TESTS:
            if fname == f and item.nodeid.split('::', 1)[-1].startswith(
                    prefix):
                item.add_marker(_pytest.mark.smoke)
                break
