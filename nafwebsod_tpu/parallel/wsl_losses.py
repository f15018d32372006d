"""Shared scope gate for the sharded training steps.

``parallel/tensor_shard.py``, ``parallel/pipeline.py`` and
``parallel/roi_shard.py`` all validate specs here. The loss assembly
itself is NOT duplicated: the sharded steps compute the fc towers their
own way and then call ``detector.wsl_tail_losses`` — the exact code the
unsharded forward runs downstream of the towers.
"""


def check_scope(spec, extra_unsupported=()):
    """Raise unless ``spec`` is within the sharded-step scope shared by the
    tensor-parallel and pipeline steps: the WSDDN / webly 2fc and context
    heads, with the OICR / PCL(device) / C-MIL refinement ladders and the
    min-entropy loss admitted (all downstream of the shared fc towers —
    they reuse ``detector.wsl_tail_losses``). Branches that re-run the conv
    body under a nested grad (CSC/CPG/deeplab), carry cross-step state
    (center loss), or pool from other feature layouts (FPN, mask) use the
    data-parallel step."""
    unsupported = (spec.csc or spec.cpg or spec.center_loss or
                   spec.mask_on or spec.supervised or
                   spec.is_fpn or spec.fused_noise_tower or
                   (spec.pcl and not spec.pcl_device) or
                   spec.box_head not in ('vgg16_2fc', 'vgg16_2fc_noise',
                                         'vgg16_context_2fc'))
    if unsupported or any(extra_unsupported):
        raise NotImplementedError(
            'this sharded step supports the WSDDN / webly / context 2fc '
            'heads with the OICR / PCL(device) / C-MIL ladders; '
            'CSC/CPG/center/mask/FPN/supervised branches use the '
            'data-parallel step')
