"""Training driver.

Capability parity with ``detectron/utils/train_wsl.py`` (+ the per-iteration
machinery of ``tools/train_net_wsl.py``): model build, AUTO_RESUME, pretrained
pkl weight loading with shared-init aliasing, the threaded RoI data loader,
LR schedule + momentum correction, gradient accumulation, NaN-loss abort,
median-smoothed JSON stats, and periodic pkl snapshots. The hot loop is one
jitted data-parallel step per iteration (``parallel/train_step.py``) instead
of ``workspace.RunNet``; one image per mesh device per micro-iteration
mirrors the reference's 1 im/GPU.
"""

import os

import jax
import numpy as np

from nafwebsod_tpu.core.config import cfg, dump_cfg, get_output_dir
from nafwebsod_tpu.data.loader import RoIDataLoader
from nafwebsod_tpu.data.roidb import combined_roidb_for_training
from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd
from nafwebsod_tpu.utils import checkpoint as ckpt
from nafwebsod_tpu.utils import lr_policy
from nafwebsod_tpu.utils.logging_utils import setup_logging
from nafwebsod_tpu.utils.training_stats import TrainingStats

logger = setup_logging(__name__)


def _round_up(n, multiple):
    return ((n + multiple - 1) // multiple) * multiple


_dump_inputs_dir = os.environ.get('NAFWEBSOD_DUMP_INPUTS')


def _dump_step_inputs(dump_dir, batch, rngs):
    """Write this process's step-0 host-local batch leaves + rng key rows
    to ``<dump_dir>/inputs_rank<r>.npz``. The cross-layout equality tests
    assert these BITWISE between the single-process and multi-process
    runs: the per-step loss tolerance can only absorb XLA
    reduction-order differences if the inputs each device sees are
    bit-identical — a permuted rng row or wrong shard slice must fail
    here, not hide under the loss tolerance."""
    import jax.numpy as jnp
    payload = {k: np.asarray(v) for k, v in batch.items()}
    kd = (jax.random.key_data(rngs)
          if jnp.issubdtype(rngs.dtype, jax.dtypes.prng_key) else rngs)
    payload['__rng_key_data'] = np.asarray(kd)
    os.makedirs(dump_dir, exist_ok=True)
    np.savez(os.path.join(
        dump_dir, 'inputs_rank%d.npz' % jax.process_index()), **payload)


def _validate_tpu_knobs(spec):
    """Reject TPU.* knob combinations before any heavy setup work."""
    # NOTE: truthiness (not > 1) — the step dispatch below enters the
    # tensor-parallel branch for ANY nonzero TENSOR_SHARDING, incl. m=1
    sharded = (cfg.TPU.ZERO_OPT or cfg.TPU.TENSOR_SHARDING or
               cfg.TPU.PIPELINE_PARALLEL or cfg.TPU.ROI_SHARDING)
    if cfg.TPU.BF16_MOMENTUM and sharded:
        raise ValueError(
            'TPU.BF16_MOMENTUM is supported on the plain DP train step '
            'only (the sharded layouts keep the reference fp32 buffers)')
    if spec.stacked_towers:
        if spec.box_head != 'vgg16_2fc_noise' or spec.is_fpn:
            raise ValueError(
                'TPU.STACKED_TOWERS requires the noise-aware dual-tower '
                'head (webly vgg16_2fc_noise) on a single-scale body — '
                'the FPN tower path consumes the per-tower names; got '
                'box head {!r}, is_fpn={}'.format(spec.box_head,
                                                  spec.is_fpn))
        if sharded:
            raise ValueError(
                'TPU.STACKED_TOWERS is supported on the plain DP train '
                'step only: the name-driven TENSOR_SHARDING/'
                'PIPELINE_PARALLEL splits consume the per-tower names, and '
                'the ZERO_OPT/ROI_SHARDING combinations are unvalidated — '
                'train sharded layouts with the per-tower layout (the '
                'stacked form only changes single-replica GEMM shapes).')


def train_model(roidb=None, max_iters=None):
    """Train the flagship model; returns (checkpoints dict, losses list).

    ``roidb``: optional pre-built roidb (tests inject fixtures); by default
    built from ``cfg.TRAIN.DATASETS`` + ``PROPOSAL_FILES``
    (train_wsl.py:33-102).
    """
    spec = detector.spec_from_cfg(cfg)
    _validate_tpu_knobs(spec)
    # (validation lives in _validate_tpu_knobs so misconfigurations fail
    # before the full-size param init)
    output_dir = get_output_dir(cfg.TRAIN.DATASETS, training=True)
    max_iters = max_iters or cfg.SOLVER.MAX_ITER
    checkpoints = {}

    # ----- AUTO_RESUME scan (train_wsl.py:121-160) -----
    start_iter = 0
    resume_weights = None
    if cfg.TRAIN.AUTO_RESUME:
        path, it = ckpt.find_checkpoint_for_resume(output_dir)
        if path is not None and it is None:
            logger.info('model_final.pkl exists; skipping training')
            checkpoints['final'] = path
            return checkpoints, []
        if path is not None:
            logger.info('Resuming from %s (iter %d)', path, it)
            resume_weights, start_iter = path, it

    # ----- params + solver state -----
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    rng, init_rng = jax.random.split(rng)
    params = detector.init_params(spec, init_rng)
    if cfg.TPU.RNG_IMPL and cfg.TPU.RNG_IMPL != 'threefry2x32':
        # per-step dropout-mask stream on the XLA RngBitGenerator fast path
        # (TPU.RNG_IMPL; ~3 ms/step cheaper than threefry at flagship
        # shapes). Param init above intentionally stays on threefry so
        # initial weights are impl-independent.
        rng = jax.random.key(cfg.RNG_SEED, impl=cfg.TPU.RNG_IMPL)
    momentum = None
    weights_file = resume_weights or cfg.TRAIN.WEIGHTS
    if weights_file:
        params, momentum, unmatched = ckpt.initialize_params_from_weights_file(
            params, weights_file)
        if unmatched:
            logger.info('Randomly initialized: %s', sorted(unmatched))

    ckpt.print_net(params)  # param table at startup (net_wsl.print_net)

    if spec.stacked_towers:
        # TPU.STACKED_TOWERS: canonical in-memory layout carries the dual
        # noise-aware towers pre-stacked (fused GEMM pair, zero per-step
        # weight concat); the on-disk pkl schema stays per-tower — _save
        # splits back, and the load above ran on the per-tower names.
        params = detector.stack_tower_params(params)
        if momentum:
            momentum = detector.stack_tower_params(
                momentum, fill_missing_with_zeros=True)

    hp = sgd.SGDHyperParams(
        momentum=cfg.SOLVER.MOMENTUM,
        weight_decay=cfg.SOLVER.WEIGHT_DECAY,
        weight_decay_gn=cfg.SOLVER.WEIGHT_DECAY_GN,
        iter_size=cfg.WSL.ITER_SIZE,
        momentum_dtype='bfloat16' if cfg.TPU.BF16_MOMENTUM else 'float32',
    )
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
    opt_state = sgd.init_state(params, hp)
    if momentum:
        # resume momentum arrives fp32 from the pkl; round into the
        # configured storage dtype (identity for the default). Externally
        # produced pkls may carry momentum blobs for params this model
        # doesn't have — skip those with a warning instead of KeyError
        live = opt_state['momentum']
        stray = [k for k in momentum if k not in live]
        if stray:
            logger.warning(
                'ignoring %d momentum blob(s) with no matching param: %s',
                len(stray), sorted(stray)[:8])
        live.update(
            {k: np.asarray(v).astype(live[k].dtype)
             for k, v in momentum.items() if k in live})

    # ----- mesh + jitted step -----
    num_devices = min(cfg.NUM_GPUS, len(jax.devices())) or 1
    if spec.center_loss:
        cf = np.asarray(params['center_feature'])
        opt_state['center_dcf'] = np.zeros_like(cf)
        opt_state['center_ndcf'] = np.zeros(cf.shape[:2], cf.dtype)
    steps_per_call = max(cfg.TPU.STEPS_PER_CALL, 1)
    multi_step_fn = None
    multi_step_with_factors = None  # DP-only lazy factor-applying driver
    mesh_obj = None  # set by the plain DP branch (multi-host capable)
    if cfg.TPU.ROI_SHARDING:
        # RoI-dimension sharding (parallel/roi_shard.py): ONE image per
        # step with its proposals split over the mesh — the memory/FLOP
        # scale-out for the R x 25088 tower axis (SURVEY.md §5.7).
        from nafwebsod_tpu.parallel import multihost as _mh
        from nafwebsod_tpu.parallel import roi_shard
        roi_mesh = roi_shard.make_roi_mesh(num_devices)
        num_devices = 1  # one logical image per step; devices hold rois
        inner_step = roi_shard.make_roi_sharded_train_step(
            spec, hp, mults, roi_mesh, donate=True)

        _roi_keys = (('image', 'rois', 'obn_scores', 'valid_mask') +
                     (('labels_int32', 'bbox_targets',
                       'bbox_inside_weights', 'bbox_outside_weights')
                      if spec.supervised else ('labels_oh',)) +
                     (('im_hw',) if spec.is_context else ()) +
                     (('cur_iter',)
                      if (spec.cmil or spec.center_loss or spec.csc or
                          spec.mask_on)
                      else ()))
        # multi-controller: every host built the identical full batch
        # (full-batch mode); lift each leaf under the step's own input
        # sharding and replicate the dropout key
        _roi_shardings = roi_shard._batch_shardings(spec, roi_mesh)

        def step_fn(params, opt_state, batch, lr, rngs):
            b = {k: batch[k][0] for k in _roi_keys}
            b = _mh.lift_full_batch(_roi_shardings, b)
            rng0 = _mh.replicate_global(roi_mesh, rngs[0])
            return inner_step(params, opt_state, b, lr, rng0)

        if steps_per_call > 1:
            inner_multi = roi_shard.make_roi_sharded_multi_train_step(
                spec, hp, mults, roi_mesh, donate=True)

            def multi_step_fn(params, opt_state, batches, lrs, factors,
                              rngs):
                b = {k: batches[k][:, 0] for k in _roi_keys}
                return inner_multi(params, opt_state, b, lrs, factors,
                                   rngs[:, 0])
    elif cfg.TPU.PIPELINE_PARALLEL:
        # 2-stage body|head pipeline (parallel/pipeline.py): microbatches
        # stream through a ppermute schedule; one step trains B images.
        from nafwebsod_tpu.parallel import multihost as _mh
        from nafwebsod_tpu.parallel import pipeline
        pipe_mesh = pipeline.make_pipe_mesh()
        num_devices = max(int(cfg.TPU.PIPELINE_MICROBATCHES), 1)
        inner_step = pipeline.make_pipeline_step(
            spec, hp, mults, pipe_mesh, donate=True,
            center_update_period=max(128 // num_devices, 1))
        # cur_iter feeds the C-MIL continuation schedule, im_hw the context
        # head's true-canvas ring clipping — pass them through when present
        _keys = ('image', 'rois', 'obn_scores', 'valid_mask', 'labels_oh',
                 'cur_iter', 'im_hw', 'labels_int32', 'bbox_targets',
                 'bbox_inside_weights', 'bbox_outside_weights',
                 'im_info', 'gt_boxes', 'gt_classes', 'gt_valid')

        def step_fn(params, opt_state, batch, lr, rngs):
            b = {k: batch[k] for k in _keys if k in batch}
            # multi-controller full-batch mode: every pipeline input is
            # REPLICATED (both stages see the whole microbatch stream), so
            # the numpy batch leaves pass through jit's trivial-sharding
            # path; only the typed rng key needs explicit global placement
            rng0 = _mh.replicate_global(pipe_mesh, rngs[0])
            return inner_step(params, opt_state, b, lr, rng0)

        if steps_per_call > 1:
            inner_multi = pipeline.make_pipeline_multi_step(
                spec, hp, mults, pipe_mesh, donate=True,
                center_update_period=max(128 // num_devices, 1))

            def multi_step_fn(params, opt_state, batches, lrs, factors,
                              rngs):
                b = {k: batches[k] for k in _keys if k in batches}
                return inner_multi(params, opt_state, b, lrs, factors,
                                   rngs[:, 0])
    elif cfg.TPU.TENSOR_SHARDING:
        # Hidden-dim (tensor) parallelism for the fc towers
        # (parallel/tensor_shard.py): devices//m data rows x m hidden
        # shards; params/opt state stay resident in the sharded layout.
        from jax.sharding import NamedSharding, PartitionSpec
        from nafwebsod_tpu.parallel import multihost as _mh
        from nafwebsod_tpu.parallel import tensor_shard
        m = int(cfg.TPU.TENSOR_SHARDING)
        assert num_devices % m == 0, (
            'TPU.TENSOR_SHARDING={} must divide the device count {}'.format(
                m, num_devices))
        tp_mesh = tensor_shard.make_tp_mesh(n_model=m,
                                            n_data=num_devices // m)
        num_devices = num_devices // m  # images per step = data rows
        inner_step = tensor_shard.make_tp_train_step(
            spec, hp, mults, tp_mesh, params, donate=True,
            center_update_period=max(128 // num_devices, 1))
        _keys = ('image', 'rois', 'obn_scores', 'valid_mask', 'labels_oh',
                 'cur_iter', 'im_hw', 'labels_int32', 'bbox_targets',
                 'bbox_inside_weights', 'bbox_outside_weights',
                 'im_info', 'gt_boxes', 'gt_classes', 'gt_valid')
        # multi-controller full-batch mode: every leaf rides the data axis
        # (the step's single batch in_sharding), the key is replicated
        _tp_shard = NamedSharding(tp_mesh,
                                  PartitionSpec(tensor_shard.DATA_AXIS))
        if _mh.is_multihost():
            # params/momentum live RESIDENT in the hidden-shard layout;
            # jit rejects host numpy under non-trivial shardings in
            # multi-process runs, so lift the (host-identical) initial
            # state into global arrays once up front
            _p_shardings = {
                k: NamedSharding(tp_mesh, tensor_shard.param_pspec(k))
                for k in params}
            _repl = NamedSharding(tp_mesh, PartitionSpec())
            _o_shardings = {
                k: ({n: _p_shardings[n] for n in v}
                    if k in ('momentum', 'grad_acc') else _repl)
                for k, v in opt_state.items()}
            params = _mh.lift_tree_global(_p_shardings, params)
            opt_state = _mh.lift_tree_global(_o_shardings, opt_state)

        def step_fn(params, opt_state, batch, lr, rngs):
            b = {k: batch[k] for k in _keys if k in batch}
            b = _mh.lift_full_batch(
                {k: _tp_shard for k in b}, b)
            rng0 = _mh.replicate_global(tp_mesh, rngs[0])
            return inner_step(params, opt_state, b, lr, rng0)

        if steps_per_call > 1:
            inner_multi = tensor_shard.make_tp_multi_train_step(
                spec, hp, mults, tp_mesh, params, donate=True,
                center_update_period=max(128 // num_devices, 1))

            def multi_step_fn(params, opt_state, batches, lrs, factors,
                              rngs):
                b = {k: batches[k] for k in _keys if k in batches}
                return inner_multi(params, opt_state, b, lrs, factors,
                                   rngs[:, 0])
    elif cfg.TPU.ZERO_OPT:
        # ZeRO-1: data-parallel step with the momentum sharded over the
        # mesh (parallel/zero.py) — psum_scatter grads, slice update,
        # all_gather params. Same batch layout as the replicated DP step.
        from nafwebsod_tpu.parallel import zero
        zmesh = mesh_lib.make_mesh(num_devices)
        # same batch layout as DP -> the multi-host data path (strided
        # roidb, form_global_batch/rngs over 'data') applies unchanged
        mesh_obj = zmesh
        opt_state = zero.momentum_from_dict(params, hp, zmesh,
                                            momentum or {})
        step_fn = zero.make_zero_train_step(
            spec, hp, mults, zmesh, params, donate=True,
            center_update_period=max(128 // num_devices, 1))
        if steps_per_call > 1:
            # factors always applied in-graph: the rescale touches only
            # the SHARDED momentum slice (|params|/n per chip), so the
            # factor-free specialization the DP path needs is moot here
            multi_step_fn = zero.make_zero_multi_train_step(
                spec, hp, mults, zmesh, params, donate=True,
                center_update_period=max(128 // num_devices, 1))
    else:
        m = mesh_lib.make_mesh(num_devices)
        mesh_obj = m
        # pre-cast bf16 shadow weights (TPU.SHADOW_BF16): measured SLOWER
        # on v5e (see core/config.py), so auto (-1) currently means off;
        # force with 1 (see parallel/train_step.init_shadow)
        want_shadow = cfg.TPU.SHADOW_BF16 == 1
        if want_shadow:
            shadow = ts.init_shadow(spec, params)
            if shadow is not None:
                opt_state['shadow'] = shadow
        step_fn = ts.make_train_step(
            spec, hp, mults, m,
            center_update_period=max(128 // num_devices, 1))
        if steps_per_call > 1:
            # primary window driver compiles WITHOUT the per-step in-graph
            # momentum rescaling (~0.3 ms/step of pure momentum rewrite at
            # factor 1.0); the factor-applying variant is built lazily for
            # the rare windows that contain an LR boundary
            multi_step_fn = ts.make_multi_train_step(
                spec, hp, mults, m, apply_factors=False,
                center_update_period=max(128 // num_devices, 1))
            _multi_cache = {}

            def multi_step_with_factors(*args):
                if 'f' not in _multi_cache:
                    logger.info('LR boundary inside a STEPS_PER_CALL '
                                'window: compiling the factor-applying '
                                'window driver')
                    _multi_cache['f'] = ts.make_multi_train_step(
                        spec, hp, mults, m, apply_factors=True,
                        center_update_period=max(128 // num_devices, 1))
                return _multi_cache['f'](*args)

    # ----- data -----
    # Multi-host: each process owns a strided roidb slice + its own loader
    # threads and contributes its chips' share of the global batch
    # (parallel/multihost.py).
    from nafwebsod_tpu.parallel import multihost as mh
    # RoI-shard / tensor-parallel / pipeline run multi-process in
    # FULL-BATCH mode: every controller builds the identical global batch
    # from the host-identical rng stream (roidb NOT strided), and the
    # step_fn closures above lift each leaf under the step's own input
    # sharding (mh.lift_full_batch; pipeline inputs are replicated, so its
    # numpy leaves ride jit's trivial-sharding path). ZeRO shares the DP
    # step's batch layout and rides the strided per-host input pipeline
    # unchanged (mesh_obj).
    full_batch_mode = mh.is_multihost() and (cfg.TPU.ROI_SHARDING or
                                             cfg.TPU.TENSOR_SHARDING or
                                             cfg.TPU.PIPELINE_PARALLEL)
    if mh.is_multihost():
        assert steps_per_call == 1 or not full_batch_mode, (
            'multi-process RoI-shard/tensor-parallel/pipeline run with '
            'TPU.STEPS_PER_CALL=1 (the window drivers do not lift '
            'full-batch leaves)')
        # the mesh must span every process: a NUM_GPUS smaller than
        # the pod builds a host-0-only mesh while other hosts still try to
        # contribute batch shards they own no devices for
        assert cfg.NUM_GPUS == len(jax.devices()), (
            'multi-host training requires NUM_GPUS ({}) == the global '
            'device count ({})'.format(cfg.NUM_GPUS, len(jax.devices())))
    local_per_step = (num_devices if full_batch_mode
                      else mh.local_device_count(num_devices))
    if roidb is None:
        roidb = combined_roidb_for_training(
            cfg.TRAIN.DATASETS, cfg.TRAIN.PROPOSAL_FILES)
    if not full_batch_mode:
        roidb = mh.shard_roidb(roidb)
    pad_rois_to = _round_up(cfg.TRAIN.BATCH_SIZE_PER_IM,
                            cfg.TPU.ROI_PAD_MULTIPLE)
    loader = RoIDataLoader(
        roidb,
        num_loaders=cfg.DATA_LOADER.NUM_THREADS,
        minibatch_queue_size=cfg.DATA_LOADER.MINIBATCH_QUEUE_SIZE,
        pad_rois_to=pad_rois_to,
        size_bucket=cfg.TPU.SIZE_BUCKET_MULTIPLE,
    )
    loader.register_sigint_handler()
    loader.start(prefill=True)

    stats = TrainingStats(num_devices=num_devices)
    # snapshot period divided by device count, as the reference divides by
    # NUM_GPUS (train_wsl.py:45)
    snapshot_iters = max(cfg.TRAIN.SNAPSHOT_ITERS // num_devices, 1)
    losses = []
    pending = []  # (iter, device_loss, device_aux) awaiting host fetch
    last_good = None  # (params, opt_state) at the last all-finite drain

    # Deterministic per-window (iter0, w, lrs, momentum-factors) schedule,
    # precomputed so the prefetch thread and the main loop share one
    # source of truth (a window = w iterations fused into one device call,
    # TPU.STEPS_PER_CALL; w == 1 is the classic per-step path).
    win_plan = []
    _it, _lr_prev = start_iter, lr_policy.get_lr_at_iter(start_iter)
    while _it < max_iters:
        w = min(steps_per_call, max_iters - _it)
        lrs, factors = [], []
        for i in range(w):
            lr = lr_policy.get_lr_at_iter(_it + i)
            factor = sgd.momentum_correction_factor(cfg, lr, _lr_prev)
            factors.append(1.0 if factor is None else factor)
            lrs.append(lr)
            _lr_prev = lr
        win_plan.append((_it, w, lrs, factors))
        _it += w

    # Batch upload shardings for the DP-batch-layout steps (plain DP and
    # ZeRO set mesh_obj; both take batch P('data') / windowed
    # P(None, 'data')). The prefetch thread device_puts under the step's
    # own input sharding so the jit call finds committed device arrays
    # and pays no synchronous transfer on the main thread.
    put_shardings = None
    if mesh_obj is not None and not mh.is_multihost():
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P
        put_shardings = {1: NamedSharding(mesh_obj, _P('data')),
                         2: NamedSharding(mesh_obj, _P(None, 'data'))}

    def _assemble_window(entry, rng_sub):
        """Window assembly: loader drain + stack + cur_iter injection +
        per-device rng rows (+ multihost canvas agreement / global-batch
        lift, + device upload for the DP-layout steps). Runs inline, or on
        the prefetch thread one window ahead (TPU.HOST_PREFETCH) — the
        produced stream is bit-identical either way."""
        it0, w, _lrs, _factors = entry
        blobs = [loader.get() for _ in range(w * local_per_step)]
        batch = ts.stack_minibatches(
            blobs, size_bucket=cfg.TPU.SIZE_BUCKET_MULTIPLE)
        if mh.is_multihost():
            # hosts agree on this iteration's image canvas so every
            # process feeds/traces identical static shapes
            gH, gW = mh.global_canvas(batch['image'].shape[2],
                                      batch['image'].shape[3])
            batch = mh.pad_batch_images(batch, gH, gW)
        # cur_iter gates the C-MIL continuation schedule AND the
        # CSC / center-loss / deeplab CSC_MAX_ITER cutoffs in
        # detector.forward_train — inject it unconditionally so those
        # branches deactivate on schedule like the reference ops
        # (csc_op/center_loss_op cur_iter >= max_iter pass-through).
        batch['cur_iter'] = np.repeat(
            np.arange(it0, it0 + w, dtype=np.float32), local_per_step)
        # the rng stream is host-identical (same seed); each process
        # takes the rows for its own devices (full-batch mode keeps
        # the whole stream — the step_fn replicates the key itself)
        rngs_global = ts.device_rngs(rng_sub, w * num_devices)
        rngs = (rngs_global if full_batch_mode else
                mh.local_device_rngs(rngs_global, w, num_devices))
        if _dump_inputs_dir and it0 == start_iter:
            # test hook (NAFWEBSOD_DUMP_INPUTS): record this process's
            # step-0 HOST-LOCAL inputs (before the multihost global lift —
            # lifted leaves span non-addressable devices) so cross-layout
            # tests can assert the shard assignment and rng routing
            # BITWISE — tests/test_multiproc_train.py
            _dump_step_inputs(_dump_inputs_dir, batch, rngs)
        if w == 1:
            if mesh_obj is not None:
                batch = mh.form_global_batch(mesh_obj, batch)
                rngs = mh.form_global_rngs(mesh_obj, rngs)
        else:
            batch = {k: v.reshape((w, local_per_step) + v.shape[1:])
                     for k, v in batch.items()}
            batch = mh.form_global_batch(mesh_obj, batch, batch_axis=1)
            rngs = mh.form_global_rngs(
                mesh_obj,
                rngs.reshape((w, local_per_step) + rngs.shape[1:]),
                batch_axis=1)
        if put_shardings is not None:
            sh = put_shardings[1 if w == 1 else 2]
            batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
            rngs = jax.device_put(rngs, sh)
        return blobs[0], batch, rngs

    # Host/device overlap (TPU.HOST_PREFETCH, VERDICT r4 item 4): assemble
    # and upload window K+1 on a background thread while window K executes
    # on the device, so wall/iter approaches max(host, device) instead of
    # their sum. The thread owns the per-window rng split chain (same
    # sequence as the inline path). Single-host only — the multi-host
    # canvas allgather must stay on the main thread to keep the
    # cross-process collective order deterministic. Reference analogue:
    # the BlobsQueue prefill pipeline (roi_data/loader_wsl.py:215-258).
    prefetch_depth = (max(int(cfg.TPU.HOST_PREFETCH), 0)
                      if not mh.is_multihost() else 0)
    win_q = stop_evt = producer = None
    if prefetch_depth:
        import queue as _queue
        import threading

        win_q = _queue.Queue(maxsize=prefetch_depth)
        stop_evt = threading.Event()

        def _produce(rng0):
            r = rng0
            try:
                for entry in win_plan:
                    if stop_evt.is_set():
                        return
                    r, sub = jax.random.split(r)
                    item = ('ok', _assemble_window(entry, sub))
                    while not stop_evt.is_set():
                        try:
                            win_q.put(item, timeout=0.5)
                            break
                        except _queue.Full:
                            continue
            except BaseException as e:  # re-raised on the main thread
                win_q.put(('err', e))

        producer = threading.Thread(target=_produce, args=(rng,),
                                    name='window-prefetch', daemon=True)
        producer.start()

    profiling = False
    try:
        for entry in win_plan:
            cur_iter, w, lrs, factors = entry
            last_it = cur_iter + w - 1
            if cfg.TPU.PROFILE_DIR:
                if cur_iter <= start_iter + 10 <= last_it:
                    jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
                    profiling = True
                elif cur_iter >= start_iter + 15 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info('Wrote profiler trace to %s',
                                cfg.TPU.PROFILE_DIR)
            stats.IterTic()
            if prefetch_depth:
                while True:
                    try:
                        kind, payload = win_q.get(timeout=5.0)
                        break
                    except _queue.Empty:
                        if not producer.is_alive():
                            raise RuntimeError(
                                'window-prefetch thread died without '
                                'reporting an error')
                        if loader.coordinator.should_stop():
                            raise RuntimeError('roi_data_loader failed')
                if kind == 'err':
                    raise payload
                blob0, batch, rngs = payload
            else:
                rng, sub = jax.random.split(rng)
                blob0, batch, rngs = _assemble_window(entry, sub)
            if any(f != 1.0 for f in factors):
                # logged at FIRE time (not at win_plan precompute) so log
                # position still correlates with when the momentum
                # correction actually applies
                logger.info('LR boundary at iters [%d, %d]: scaling '
                            'momentum by %s', cur_iter, last_it,
                            [f for f in factors if f != 1.0])
            if w == 1:
                if factors[0] != 1.0:
                    opt_state = sgd.scale_momentum(
                        opt_state, np.float32(factors[0]))
                params, opt_state, loss, aux = step_fn(
                    params, opt_state, batch, np.float32(lrs[0]), rngs)
            else:
                # the DP window driver skips in-graph momentum rescaling;
                # windows containing an LR boundary use the lazy
                # factor-applying variant
                mfn = multi_step_fn
                if (multi_step_with_factors is not None and
                        any(f != 1.0 for f in factors)):
                    mfn = multi_step_with_factors
                params, opt_state, loss, aux = mfn(
                    params, opt_state, batch,
                    np.asarray(lrs, np.float32),
                    np.asarray(factors, np.float32),
                    rngs)

            # Defer the host fetch: a per-step sync would serialize the
            # pipeline (and costs a full RTT on remote-TPU rigs). Losses are
            # drained every LOG_PERIOD iterations; the NaN guard
            # (train_wsl.py:77-83) therefore fires within LOG_PERIOD steps
            # of the event instead of immediately.
            pending.append((cur_iter, w, loss, aux))
            if (last_it % stats.LOG_PERIOD < w or
                    last_it + 1 == max_iters or
                    (last_it + 1) % snapshot_iters < w):
                for it_0, w_i, l_i, aux_i in pending:
                    l_host = np.atleast_1d(np.asarray(l_i))
                    aux_host = {k: np.atleast_1d(np.asarray(v))
                                for k, v in aux_i.items()}
                    for j in range(w_i):
                        lj = float(l_host[j])
                        losses.append(lj)
                        stats.UpdateIterStats(
                            lj, {k: float(v[j])
                                 for k, v in aux_host.items()})
                        if np.isnan(lj):
                            # dump the params from the last all-finite
                            # drain: the pipeline has stepped past the NaN
                            # event, so the CURRENT params already contain
                            # NaNs — the last-known-good snapshot is the
                            # debuggable one (reference dumps at-event
                            # params, train_wsl.py:77-83)
                            good = last_good or (params, opt_state)
                            try:
                                _save(os.path.join(output_dir,
                                                   'model_nan.pkl'), *good)
                            except RuntimeError:
                                # last_good buffers were DONATED by a later
                                # step (deleted on device): fall back to the
                                # current post-NaN params — still the
                                # reference's at-event dump semantics
                                # (train_wsl.py:77-83)
                                logger.warning(
                                    'last-good params were donated; dumping '
                                    'the current (post-NaN) params instead')
                                _save(os.path.join(output_dir,
                                                   'model_nan.pkl'),
                                      params, opt_state)
                            raise FloatingPointError(
                                'Loss is NaN at iter {}'.format(it_0 + j))
                pending = []
                last_good = (params, opt_state)
            stats.IterToc(span=w)
            stats.LogIterStats(last_it, lrs[-1],
                               queue_size=loader.queue_size())

            if (cfg.WSL.SAMPLE and cur_iter % cfg.WSL.SAMPLE_ITER < w and
                    mh.process_index() == 0):
                vp = params
                if mh.is_multihost():
                    # params are replicated over the GLOBAL mesh; host 0
                    # must not dispatch a solo computation on arrays that
                    # span other hosts' devices — visualize from a
                    # host-local copy (like _save does)
                    vp = {k: np.asarray(v) for k, v in params.items()}
                _vis_sample(spec, vp, blob0, output_dir, cur_iter)

            if ((last_it + 1) % snapshot_iters < w and
                    last_it + 1 < max_iters):
                path = os.path.join(
                    output_dir, 'model_iter{}.pkl'.format(last_it))
                _save(path, params, opt_state)
                checkpoints[last_it] = path

            if loader.coordinator.should_stop():
                raise RuntimeError('roi_data_loader failed')
    finally:
        if profiling:
            jax.profiler.stop_trace()
        if stop_evt is not None:
            stop_evt.set()
            try:  # unblock a producer parked in win_q.put
                while True:
                    win_q.get_nowait()
            except Exception:
                pass
        # shutdown BEFORE joining the producer: a producer parked in
        # loader.get() only unblocks when the loader stops — joining
        # first would burn the full join timeout on every loader failure
        loader.shutdown()
        if producer is not None:
            producer.join(timeout=10)

    final_path = os.path.join(output_dir, 'model_final.pkl')
    _save(final_path, params, opt_state)
    checkpoints['final'] = final_path
    return checkpoints, losses


def _vis_sample(spec, params, blobs, output_dir, cur_iter):
    """Periodic training visualization (webly_vis.vis_training via
    train_wsl.py:92-95): dump the input image + per-gt-class RoI heatmaps,
    and with WEBLY.ENTROPY the entropy/class-weight maps — the paper's core
    mechanism (webly_vis.py:18-66 save_entropy)."""
    try:
        from nafwebsod_tpu.utils import vis
        out = detector.forward_test(
            spec, params, jnp_asarray(blobs['data']),
            jnp_asarray(blobs['rois']), jnp_asarray(blobs['obn_scores']),
            jnp_asarray(blobs['valid_mask']))
        vis_dir = os.path.join(output_dir, 'vis')
        vis.vis_training(
            vis_dir, cur_iter, blobs['data'],
            blobs['rois'], np.asarray(out['rois_pred']), blobs['labels_oh'],
            pixel_means=cfg.PIXEL_MEANS)
        if spec.is_webly and spec.webly_entropy and 'rois_pred' in out:
            from nafwebsod_tpu.models import heads
            from nafwebsod_tpu.ops.entropy import spatial_entropy_weights
            rois_pred = out['rois_pred']
            cls_prob = heads.cls_pred(rois_pred)
            cw, cwn, inter = spatial_entropy_weights(
                rois_pred, cls_prob, jnp_asarray(blobs['rois']),
                jnp_asarray(blobs['labels_oh']),
                jnp_asarray(blobs['valid_mask']),
                return_intermediates=True)
            vis.vis_training_entropy(
                vis_dir, cur_iter, blobs['data'], blobs['rois'], inter,
                cw, cwn, blobs['labels_oh'], pixel_means=cfg.PIXEL_MEANS)
        if spec.cpg or spec.csc:
            # CPG saliency dump (cpg_vis.vis_training via train_wsl.py:95).
            # A deterministic iter-folded rng keeps the dumped maps
            # dropout-ACTIVE like the ones csc_weights consumed in the
            # step (representative, not byte-identical — the step's own
            # key lives inside the jitted scan)
            vis_rng = jax.random.fold_in(
                jax.random.key(cfg.RNG_SEED, impl=cfg.TPU.RNG_IMPL),
                cur_iter)
            maps, idx, keep = detector.forward_cpg_maps(
                spec, params, jnp_asarray(blobs['data']),
                jnp_asarray(blobs['rois']), jnp_asarray(blobs['obn_scores']),
                jnp_asarray(blobs['valid_mask']),
                jnp_asarray(blobs['labels_oh']), rng=vis_rng)
            vis.vis_training_cpg(vis_dir, cur_iter, blobs['data'], maps,
                                 idx, keep, pixel_means=cfg.PIXEL_MEANS)
    except Exception:
        logger.exception('vis_training failed (non-fatal)')


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def _host_fetch(tree):
    """``np.asarray`` every leaf of a flat dict; leaves sharded across
    process boundaries (TP params/momentum, multihost) are first
    collectively replicated over their mesh — EVERY process must call
    this (the jit identity is a co-dispatched collective), which is why
    ``_save`` fetches before its host-0-only early return."""
    import jax as _jax
    from jax.sharding import NamedSharding as _NS, PartitionSpec as _P
    out = {}
    for k, v in tree.items():
        if isinstance(v, _jax.Array) and not v.is_fully_addressable:
            v = _jax.jit(lambda x: x, out_shardings=_NS(
                v.sharding.mesh, _P()))(v)
        out[k] = np.asarray(v)
    return out


def _save(path, params, opt_state):
    import jax as _jax
    # Multi-controller: any leaf still sharded over the global mesh (ZeRO
    # flat momentum, TP params/momentum) needs a COLLECTIVE gather that
    # every process co-dispatches — all host fetches happen before the
    # host-0-only write below.
    if set(opt_state['momentum']) == {'flat'}:
        # ZeRO-1 state (parallel/zero.py): gather the sharded vector back
        # into the reference per-param momentum schema
        from nafwebsod_tpu.parallel import zero
        host_mom = zero.momentum_to_dict(params, opt_state)
    else:
        host_mom = _host_fetch(opt_state['momentum'])
    host_params = _host_fetch(params)
    # TPU.STACKED_TOWERS: split the stacked in-memory tower leaves back
    # into the reference per-tower blobs so the on-disk pkl schema is
    # unchanged (no-op for the per-tower layout)
    host_params = detector.unstack_tower_params(host_params)
    host_mom = detector.unstack_tower_params(host_mom)
    # TPU.BF16_MOMENTUM: the pkl schema carries fp32 momentum regardless
    # of the in-memory storage dtype
    host_mom = {k: (v.astype(np.float32) if str(v.dtype) == 'bfloat16'
                    else v)
                for k, v in host_mom.items()}
    if _jax.process_index() != 0:
        # multi-host: host 0 writes the checkpoint (the analogue of the
        # reference's GPU0-owns-weights convention, net_wsl.py:183-207)
        return path
    logger.info('Saving checkpoint to %s', path)
    ckpt.save_params_to_weights_file(
        path, host_params, momentum=host_mom, cfg_yaml=dump_cfg())
    return path
