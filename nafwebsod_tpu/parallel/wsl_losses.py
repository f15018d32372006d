"""Shared scope gate for the sharded training steps.

``parallel/tensor_shard.py``, ``parallel/pipeline.py`` and
``parallel/roi_shard.py`` all validate specs here. The loss assembly
itself is NOT duplicated: the sharded steps compute the fc towers their
own way and then call ``detector.wsl_tail_losses`` — the exact code the
unsharded forward runs downstream of the towers.
"""


def check_scope(spec, extra_unsupported=(), allow_center=False,
                allow_supervised=False, allow_faster_rcnn=False,
                allow_csc=False, allow_seg=False):
    """Raise unless ``spec`` is within the sharded-step scope shared by the
    tensor-parallel and pipeline steps: the WSDDN / webly 2fc and context
    heads, with the OICR / PCL(device) / C-MIL refinement ladders and the
    min-entropy loss admitted (all downstream of the shared fc towers —
    they reuse ``detector.wsl_tail_losses``), plus — for steps that pass
    ``allow_supervised=True`` — the supervised precomputed-proposal Fast
    R-CNN 2fc head (same towers; its tail is
    ``detector.fast_rcnn_tail_losses``). Branches that re-run the conv
    body under a nested grad (CSC/CPG/deeplab) are admitted only where
    the step passes ``allow_csc`` / ``allow_seg`` (the RoI-sharded step
    threads both); other feature layouts (FPN, res5/Xconv) and head
    networks on the body itself (RPN-in-graph Faster R-CNN, RetinaNet)
    use the data-parallel step. Center loss carries cross-step
    accumulator state; steps that
    thread it (the tensor-parallel step does — replicated dCF/ndCF in the
    opt state, deltas summed over the data axis) pass
    ``allow_center=True``."""
    if spec.supervised:
        # end-to-end Faster R-CNN (RPN in-graph) only where the step
        # injects its tower into the unsharded forward (allow_faster_rcnn:
        # the tensor-parallel step; everything outside the towers is
        # replicated across the model axis)
        unsupported = (not allow_supervised or
                       (spec.faster_rcnn and not allow_faster_rcnn) or
                       spec.rfcn or spec.mask_on or spec.keypoints_on or
                       spec.rpn_only or spec.is_fpn or
                       spec.box_head != 'vgg16_2fc')
    else:
        # CPG rides along with CSC (the reference's CSC configs set both)
        # and with the deeplab seg head (the WSL seg configs set WSL.CPG);
        # standalone CPG outside those families stays on the data-parallel
        # step. ``allow_seg`` admits the WSL mask branches — the per-RoI
        # MIL fcn head and the image-level deeplab head (the RoI-sharded
        # step threads both; v0up/v0upshare are ResNet res5 heads outside
        # the vgg16_2fc tower scope).
        seg_ok = allow_seg and spec.mask_head in ('fcn', 'deeplab')
        unsupported = ((spec.csc and not allow_csc) or
                       (spec.cpg and not ((spec.csc and allow_csc) or
                                          (spec.mask_on and seg_ok))) or
                       (spec.center_loss and not allow_center) or
                       (spec.mask_on and not seg_ok) or spec.retinanet or
                       spec.retinanet_wsl or spec.rpn_only or
                       spec.is_fpn or spec.fused_noise_tower or
                       (spec.pcl and not spec.pcl_device) or
                       spec.box_head not in ('vgg16_2fc', 'vgg16_2fc_noise',
                                             'vgg16_context_2fc'))
    if unsupported or any(extra_unsupported):
        raise NotImplementedError(
            'this sharded step supports the WSDDN / webly / context 2fc '
            'heads with the OICR / PCL(device) / C-MIL ladders, plus the '
            'supervised precomputed-proposal Fast R-CNN 2fc head where the '
            'step threads its tail; CSC/CPG/mask/FPN/RPN-in-graph/RetinaNet '
            'branches (and center loss / the fcn+deeplab seg heads where '
            'the step does not thread them) use the data-parallel step')


def center_tail(spec, params, opt_state, deltas, center_update_period):
    """Post-SGD center move shared by the sharded steps — identical to the
    DP step's tail (train_step._step_body): accumulate the globally-summed
    dCF/ndCF deltas and fire the periodic center update; the CF param
    itself was frozen through ``sgd.update`` (lr_mult == wd == 0)."""
    from nafwebsod_tpu.ops import center as center_ops
    accum = {'center_dcf': opt_state['center_dcf'],
             'center_ndcf': opt_state['center_ndcf']}
    cf, accum = center_ops.center_update(
        params['center_feature'], accum,
        {'center_dcf': deltas['__center_dcf'],
         'center_ndcf': deltas['__center_ndcf']},
        opt_state['it'], spec.center_loss_top_k,
        update=center_update_period)
    params = dict(params)
    params['center_feature'] = cf
    opt_state = dict(opt_state)
    opt_state['center_dcf'] = accum['center_dcf']
    opt_state['center_ndcf'] = accum['center_ndcf']
    return params, opt_state
