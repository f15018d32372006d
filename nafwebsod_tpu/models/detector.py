"""Model assembly: cfg -> pure jittable forward/loss functions.

Replaces the reference's string-dispatched graph factory
(``detectron/modeling/model_builder_wsl.py:163-208,289-458``) with a
functional builder: ``build_model(cfg)`` snapshots the relevant config into a
hashable ``ModelSpec`` and returns pure functions over a flat param dict.
The same CONV_BODY / ROI_BOX_HEAD strings used by reference YAMLs select the
TPU implementations.

Batching: the reference trains 1 image/GPU (TRAIN.IMS_PER_BATCH == 1,
asserted at wsl_heads.py:214); the per-image functions here are vmapped /
sharded by the parallel layer for multi-chip training.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nafwebsod_tpu.models import heads, vgg16
from nafwebsod_tpu.ops import center as center_ops
from nafwebsod_tpu.ops import losses as loss_ops
from nafwebsod_tpu.ops import refine as refine_ops
from nafwebsod_tpu.ops.entropy import spatial_entropy_weights

_SUPPORTED_BODIES = {
    'VGG16.add_VGG16_conv5_body_origin': 'vgg16_c5',
    'ResNet.add_ResNet50_conv4_body': 'resnet50_c4',
    'ResNet.add_ResNet50_conv5_body': 'resnet50_c5',
    'ResNet.add_ResNet101_conv4_body': 'resnet101_c4',
    'ResNet.add_ResNet101_conv5_body': 'resnet101_c5',
    'ResNet.add_ResNet152_conv5_body': 'resnet152_c5',
    'VGG_CNN_M_1024.add_VGG_CNN_M_1024_conv5_body': 'vgg_cnn_m_c5',
    'ResNet18.add_ResNet18_conv4_body': 'resnet18_c4',
    'ResNet18.add_ResNet18_conv5_body': 'resnet18_c5',
    # FPN bodies (FPN.py:47-94): ResNet backbone + pyramid; RoIs ride the
    # multilevel transform (fpn.multilevel_roi_pool)
    'FPN.add_fpn_ResNet50_conv5_body': 'fpn_resnet50',
    'FPN.add_fpn_ResNet101_conv5_body': 'fpn_resnet101',
    'FPN.add_fpn_ResNet152_conv5_body': 'fpn_resnet152',
    'FPN.add_fpn_ResNet18_conv5_body': 'fpn_resnet18',
}
# internal body name -> feature channel count (FPN bodies: spec.fpn_dim)
_BODY_OUT_DIM = {
    'vgg16_c5': 512,
    'resnet50_c4': 1024, 'resnet101_c4': 1024,
    'resnet50_c5': 2048, 'resnet101_c5': 2048, 'resnet152_c5': 2048,
    'resnet18_c4': 256, 'resnet18_c5': 512,
    'vgg_cnn_m_c5': 512,
}
_SUPPORTED_HEADS = {
    'wsl_heads.add_VGG16_roi_2fc_head': 'vgg16_2fc',
    'webly_heads.add_VGG16_roi_2fc_noise_head': 'vgg16_2fc_noise',
    'wsl_heads.add_VGG16_roi_context_2fc_head': 'vgg16_context_2fc',
    # ResNet/generic 2fc WSL head — identical fc6/fc7 tower over the pooled
    # body features (wsl_heads.py:860-905); hidden width from
    # FAST_RCNN.MLP_HEAD_DIM via TPU.HEAD_HIDDEN_DIM
    'wsl_heads.add_ResNet_roi_2fc_head': 'vgg16_2fc',
    # supervised Fast R-CNN 2-MLP head (fast_rcnn_heads.py:100-126) — same
    # tower; outputs switch to cls_score/bbox_pred when spec.supervised
    'fast_rcnn_heads.add_roi_2mlp_head': 'vgg16_2fc',
    # res5-stage conv head over pooled RoIs + global avg pool
    # (ResNet.add_ResNet_roi_conv5_head, ResNet.py:143-170) — the C4
    # Faster/Fast R-CNN box head
    'ResNet.add_ResNet_roi_conv5_head': 'res5_head',
    # older alias used by the 12_2017 baseline configs
    'head_builder.add_roi_2mlp_head': 'vgg16_2fc',
    # X stacked convs + GN + 1 fc (fast_rcnn_heads.py:129-163; the
    # 04_2018 GN baselines)
    'fast_rcnn_heads.add_roi_Xconv1fc_gn_head': 'xconv1fc_gn',
}


@dataclass(frozen=True)
class ModelSpec:
    """Hashable snapshot of the model-relevant config keys."""
    num_classes: int = 21
    conv_body: str = 'vgg16_c5'
    box_head: str = 'vgg16_2fc_noise'
    dilation: int = 2
    freeze_conv_body: bool = True
    freeze_at: int = 2
    roi_xform_method: str = 'RoIPoolF'
    roi_resolution: int = 7
    roi_sampling_ratio: int = 2
    webly_on: bool = True
    webly_entropy: bool = True
    mean_loss: bool = True
    min_entropy_loss: bool = False
    # refinement ladders (mutually exclusive, wsl_heads.py:443-452)
    oicr: bool = False
    pcl: bool = False
    pcl_device: bool = False  # device PCL targets (WSL.PCL_DEVICE)
    cmil: bool = False
    # C-MIL continuation schedule (wsl_heads.py:96-101)
    size_epoch: int = 5000
    max_iter: int = 40000
    # context streams (wsl_heads.py:684-766; WSL.CONTEXT_RATIO)
    context_ratio: float = 1.8
    # CPG/CSC saliency weighting (wsl_heads.py:305-407)
    cpg: bool = False
    csc: bool = False
    cpg_tau: float = 0.7
    csc_fg_threshold: float = 0.1
    # bounded per-image gt-class capacity for CPG backward passes
    max_gt_cpg: int = 4
    # mask branch (MODEL.MASK_ON): mask_head selects the architecture from
    # MRCNN.ROI_MASK_HEAD — 'fcn' = v1upXconvs(_gn) conv tower with
    # mask_num_convs/mask_gn (mask_rcnn_heads.py:112-230 and the WSL
    # wsl_seg_heads.py:514-691 equivalents), 'v0up'/'v0upshare' = res5
    # stage + deconv (mask_rcnn_heads.py:238-300; v0upshare reads the box
    # head's res5 weights), 'deeplab' = the WSL ASPP/CRF branch
    mask_on: bool = False
    mask_head: str = 'fcn'
    mask_num_convs: int = 2
    mask_gn: bool = False
    mask_resolution: int = 14
    mask_dim_reduced: int = 256
    mask_dilation: int = 2
    mask_loss_weight: float = 1.0
    mask_cls_specific: bool = True
    # center loss (wsl_heads.py:230-276)
    center_loss: bool = False
    center_loss_number: int = 5
    center_loss_top_k: int = 10
    csc_max_iter: int = 35000
    # CPGSW saliency switch cutoff (WSL.CPG_MAX_ITER; 0 = disabled, the
    # reference default — cpg_sw_op.cu:59-61)
    cpg_max_iter: int = 0
    compute_dtype: str = 'float32'
    # supervised Fast R-CNN path (MODEL.TYPE generalized_rcnn):
    # cls_score/bbox_pred outputs + SoftmaxWithLoss/SmoothL1 losses
    supervised: bool = False
    cls_agnostic_bbox_reg: bool = False
    bbox_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    # end-to-end Faster R-CNN (MODEL.FASTER_RCNN): RPN in the graph
    # (model_builder.py:74-112); proposals generated on device, fg/bg
    # sampled on device (ops/rpn_device.py) instead of the reference's
    # host python ops
    faster_rcnn: bool = False
    # RPN-only proposal-generation model (MODEL.TYPE 'rpn' / MODEL.RPN_ONLY,
    # model_builder.py rpn type + core/rpn_generator.py): trains just the
    # RPN; inference emits proposals for a proposal pkl
    rpn_only: bool = False
    rpn_sizes: tuple = (64, 128, 256, 512)
    rpn_stride: int = 16
    rpn_aspect_ratios: tuple = (0.5, 1.0, 2.0)
    rpn_straddle_thresh: float = 0.0
    rpn_positive_overlap: float = 0.7
    rpn_negative_overlap: float = 0.3
    rpn_fg_fraction: float = 0.5
    rpn_batch_size: int = 256
    rpn_pre_nms_top_n: int = 12000
    rpn_post_nms_top_n: int = 2000
    rpn_test_pre_nms_top_n: int = 12000
    rpn_test_post_nms_top_n: int = 2000
    rpn_nms_thresh: float = 0.7
    rpn_test_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    # Fast R-CNN fg/bg sampling (roi_data/fast_rcnn.py)
    frcnn_batch_size: int = 512
    frcnn_fg_fraction: float = 0.25
    frcnn_fg_thresh: float = 0.5
    frcnn_bg_thresh_hi: float = 0.5
    frcnn_bg_thresh_lo: float = 0.0
    # FPN (cfg.FPN.*, FPN.py:47-94): pyramid dim, RoI/RPN level ranges,
    # Eqn.1 canonical scale/level, conv vs subsample extra levels
    fpn_dim: int = 256
    fpn_roi_min_level: int = 2
    fpn_roi_max_level: int = 5
    fpn_rpn_min_level: int = 2
    fpn_rpn_max_level: int = 6
    fpn_canonical_scale: int = 224
    fpn_canonical_level: int = 4
    fpn_extra_conv_levels: bool = False
    fpn_rpn_anchor_start_size: int = 32
    fpn_rpn_aspect_ratios: tuple = (0.5, 1.0, 2.0)
    # RetinaNet (cfg.RETINANET.*): supervised one-stage model
    # (MODEL.TYPE 'retinanet', retinanet_heads.py:64-246,447-510) and the
    # WSL variant (RETINANET.RETINANET_ON under generalized_wsl,
    # model_builder_wsl.py:580-594)
    retinanet: bool = False
    retinanet_wsl: bool = False
    retinanet_aspect_ratios: tuple = (0.5, 1.0, 2.0)
    retinanet_scales_per_octave: int = 3
    retinanet_anchor_scale: int = 4
    retinanet_num_convs: int = 4
    retinanet_prior_prob: float = 0.01
    retinanet_loss_alpha: float = 0.25
    retinanet_loss_gamma: float = 2.0
    retinanet_bbox_reg_beta: float = 0.11
    retinanet_bbox_reg_weight: float = 1.0
    retinanet_class_specific_bbox: bool = False
    retinanet_positive_overlap: float = 0.5
    retinanet_negative_overlap: float = 0.4
    retinanet_inference_th: float = 0.05
    retinanet_pre_nms_top_n: int = 1000
    # R-FCN (MODEL.TYPE 'rfcn', model_builder.py:93 + rfcn_heads.py:29-99):
    # position-sensitive score maps replace the fc box tower
    rfcn: bool = False
    rfcn_ps_grid: int = 3
    # Keypoint R-CNN (MODEL.KEYPOINTS_ON, keypoint_rcnn_heads.py)
    keypoints_on: bool = False
    num_keypoints: int = 17
    keypoint_num_convs: int = 8
    keypoint_conv_dim: int = 512
    keypoint_deconv_dim: int = 256
    keypoint_resolution: int = 14
    keypoint_loss_weight: float = 1.0
    keypoint_normalize_by_visible: bool = True
    # fc6/fc7 width; 4096 in the reference (wsl_heads.py:674-679). Tests use a
    # narrow tower to keep single-core CPU runtimes sane.
    hidden_dim: int = 4096
    # run the clean+noisy towers as one width-doubled GEMM pair
    # (TPU.FUSED_NOISE_TOWER; mathematically identical, fewer MXU launches)
    fused_noise_tower: bool = False
    # batch ONLY the fc7 GEMMs across the two towers (TPU.FUSED_FC7)
    fused_fc7: bool = False
    # carry the dual noise-aware towers PRE-STACKED in the param pytree
    # (TPU.STACKED_TOWERS): fused GEMM pair with zero per-step concat;
    # checkpoints keep the per-tower reference pkl schema (split at save,
    # joined at load — see stack_tower_params/unstack_tower_params)
    stacked_towers: bool = False
    # rematerialize the conv body in backward (TPU.REMAT_BODY)
    remat_body: bool = False
    # Xconv1fc GN head sizing (FAST_RCNN.CONV_HEAD_DIM / NUM_STACKED_CONVS)
    conv_head_dim: int = 256
    num_stacked_convs: int = 4
    # ResNeXt trunk (cfg.RESNETS.*): grouped 3x3 bottleneck convs when
    # num_groups > 1 (X-101-32x8d etc.); stride placement per STRIDE_1X1
    resnets_num_groups: int = 1
    resnets_width_per_group: int = 64
    resnets_stride_1x1: bool = True

    @property
    def body_out_dim(self):
        if self.is_fpn:
            return self.fpn_dim
        return _BODY_OUT_DIM[self.conv_body]

    @property
    def is_fpn(self):
        return self.conv_body.startswith('fpn_')

    @property
    def fpn_level_range(self):
        """(min, max) pyramid levels the body must produce."""
        if self.retinanet or self.retinanet_wsl:
            return self.fpn_rpn_min_level, self.fpn_rpn_max_level
        lo, hi = self.fpn_roi_min_level, self.fpn_roi_max_level
        if self.faster_rcnn:
            lo = min(lo, self.fpn_rpn_min_level)
            hi = max(hi, self.fpn_rpn_max_level)
        return lo, hi

    @property
    def is_webly(self):
        return self.box_head.endswith('noise') or self.webly_on

    @property
    def is_context(self):
        return self.box_head == 'vgg16_context_2fc'

    @property
    def refine_k(self):
        """Number of refinement classifiers: OICR/PCL use 3, C-MIL 2
        (wsl_heads.py:110-180)."""
        if self.cmil:
            return 2
        if self.oicr or self.pcl:
            return 3
        return 0


def _default_backend_is_tpu():
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def spec_from_cfg(cfg):
    body = cfg.MODEL.CONV_BODY
    head = cfg.FAST_RCNN.ROI_BOX_HEAD
    if body not in _SUPPORTED_BODIES:
        raise NotImplementedError('CONV_BODY {} not implemented'.format(body))
    retinanet = cfg.MODEL.TYPE == 'retinanet'
    retinanet_wsl = (cfg.RETINANET.RETINANET_ON and not retinanet)
    rpn_only = cfg.MODEL.RPN_ONLY or cfg.MODEL.TYPE == 'rpn'
    if retinanet or retinanet_wsl:
        assert _SUPPORTED_BODIES[body].startswith('fpn_'), \
            'RetinaNet needs an FPN conv body'
        assert not cfg.RETINANET.SOFTMAX or retinanet_wsl, \
            'supervised RETINANET.SOFTMAX head not supported (sigmoid only)'
        assert not cfg.RETINANET.SHARE_CLS_BBOX_TOWER, \
            'RETINANET.SHARE_CLS_BBOX_TOWER not supported'
    elif (cfg.MODEL.TYPE != 'rfcn' and not rpn_only and
          head not in _SUPPORTED_HEADS):
        raise NotImplementedError('ROI_BOX_HEAD {} not implemented'.format(head))
    if cfg.MODEL.TYPE == 'rfcn' and _SUPPORTED_BODIES[body].startswith(
            'fpn_'):
        # fail at CONFIG time like every other unsupported combination —
        # the rfcn forward branches bind feat/spatial_scale only on the
        # single-scale path and would otherwise die mid-trace
        raise NotImplementedError(
            'R-FCN over an FPN body is not supported (the reference wires '
            'R-FCN to C4/C5 bodies only, model_builder.py:93)')
    if retinanet or retinanet_wsl or rpn_only or cfg.MODEL.TYPE == 'rfcn':
        head = 'fast_rcnn_heads.add_roi_2mlp_head'  # unused placeholder
    if (cfg.MODEL.MASK_ON and _SUPPORTED_BODIES[body].startswith('fpn_')
            and cfg.MODEL.TYPE == 'generalized_wsl'
            and 'deeplab' in cfg.MRCNN.ROI_MASK_HEAD):
        raise NotImplementedError(
            'the WSL deeplab mask branch is single-scale (ASPP over conv5 '
            'and CPG need one map) — use the fcn mask head with FPN bodies')
    if cfg.WEBLY.MINING:
        # the reference's WEBLY.MINING switch calls webly_heads.
        # add_webly_mining which does not exist anywhere in the reference
        # codebase (model_builder_wsl.py:444) — the path is dead code there
        # and raises here for the same reason.
        raise NotImplementedError(
            'WEBLY.MINING is a broken code path in the reference '
            '(add_webly_mining is undefined); not supported')
    return ModelSpec(
        num_classes=cfg.MODEL.NUM_CLASSES,
        conv_body=_SUPPORTED_BODIES[body],
        box_head=_SUPPORTED_HEADS[head],
        dilation=cfg.WSL.DILATION,
        freeze_conv_body=cfg.TRAIN.FREEZE_CONV_BODY,
        freeze_at=cfg.TRAIN.FREEZE_AT,
        roi_xform_method=cfg.FAST_RCNN.ROI_XFORM_METHOD,
        roi_resolution=cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
        roi_sampling_ratio=cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
        webly_on=cfg.WEBLY.WEBLY_ON,
        webly_entropy=cfg.WEBLY.ENTROPY,
        mean_loss=cfg.WSL.MEAN_LOSS,
        min_entropy_loss=cfg.WSL.MIN_ENTROPY_LOSS,
        compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        fused_noise_tower=cfg.TPU.FUSED_NOISE_TOWER,
        fused_fc7=cfg.TPU.FUSED_FC7,
        stacked_towers=cfg.TPU.STACKED_TOWERS,
        remat_body=cfg.TPU.REMAT_BODY,
        # ResNet heads size their MLP from FAST_RCNN.MLP_HEAD_DIM
        # (wsl_heads.py:867-872); VGG towers are 4096 (TPU.HEAD_HIDDEN_DIM);
        # the res5 conv head emits the res5 width (2048 / 512-shallow)
        hidden_dim=((512 if '18' in body else 2048)
                    if _SUPPORTED_HEADS.get(head) == 'res5_head'
                    else cfg.FAST_RCNN.MLP_HEAD_DIM
                    if ('ResNet' in head or
                        _SUPPORTED_HEADS.get(head) == 'xconv1fc_gn')
                    else cfg.TPU.HEAD_HIDDEN_DIM),
        conv_head_dim=cfg.FAST_RCNN.CONV_HEAD_DIM,
        num_stacked_convs=cfg.FAST_RCNN.NUM_STACKED_CONVS,
        resnets_num_groups=cfg.RESNETS.NUM_GROUPS,
        resnets_width_per_group=cfg.RESNETS.WIDTH_PER_GROUP,
        resnets_stride_1x1=cfg.RESNETS.STRIDE_1X1,
        oicr=cfg.WSL.OICR,
        pcl=cfg.WSL.PCL,
        # auto-enable the device pseudo-labeling on TPU backends: remote-
        # attached runtimes (axon PJRT) implement no host callbacks at all,
        # and even directly-attached hosts pay an RTT per refinement stage
        pcl_device=bool(cfg.WSL.PCL_DEVICE or
                        (cfg.WSL.PCL and _default_backend_is_tpu())),
        cmil=cfg.WSL.CMIL,
        size_epoch=cfg.WSL.SIZE_EPOCH,
        max_iter=cfg.SOLVER.MAX_ITER,
        context_ratio=cfg.WSL.CONTEXT_RATIO,
        mask_on=cfg.MODEL.MASK_ON,
        **_mask_head_fields(cfg.MRCNN.ROI_MASK_HEAD, cfg.MODEL.MASK_ON),
        mask_resolution=cfg.MRCNN.ROI_XFORM_RESOLUTION,
        mask_dim_reduced=cfg.MRCNN.DIM_REDUCED,
        mask_dilation=cfg.MRCNN.DILATION,
        mask_loss_weight=cfg.MRCNN.WEIGHT_LOSS_MASK,
        mask_cls_specific=cfg.MRCNN.CLS_SPECIFIC_MASK,
        cpg=cfg.WSL.CPG,
        csc=cfg.WSL.CSC,
        cpg_tau=cfg.WSL.CPG_TAU,
        csc_fg_threshold=cfg.WSL.CSC_FG_THRESHOLD,
        # 0 = reference-faithful unbounded (every gt class gets a map)
        max_gt_cpg=(cfg.TPU.CPG_MAX_GT or cfg.MODEL.NUM_CLASSES - 1),
        center_loss=cfg.WSL.CENTER_LOSS,
        center_loss_number=cfg.WSL.CENTER_LOSS_NUMBER,
        center_loss_top_k=cfg.WSL.CENTER_LOSS_TOP_K,
        csc_max_iter=cfg.WSL.CSC_MAX_ITER,
        cpg_max_iter=cfg.WSL.CPG_MAX_ITER,
        supervised=cfg.MODEL.TYPE in ('generalized_rcnn', 'rfcn'),
        rfcn=cfg.MODEL.TYPE == 'rfcn',
        rfcn_ps_grid=cfg.RFCN.PS_GRID_SIZE,
        keypoints_on=cfg.MODEL.KEYPOINTS_ON,
        num_keypoints=max(cfg.KRCNN.NUM_KEYPOINTS, 1),
        keypoint_num_convs=cfg.KRCNN.NUM_STACKED_CONVS,
        keypoint_conv_dim=cfg.KRCNN.CONV_HEAD_DIM,
        keypoint_deconv_dim=cfg.KRCNN.DECONV_DIM,
        keypoint_resolution=cfg.KRCNN.ROI_XFORM_RESOLUTION,
        keypoint_loss_weight=cfg.KRCNN.LOSS_WEIGHT,
        keypoint_normalize_by_visible=(
            cfg.KRCNN.NORMALIZE_BY_VISIBLE_KEYPOINTS),
        cls_agnostic_bbox_reg=cfg.MODEL.CLS_AGNOSTIC_BBOX_REG,
        bbox_reg_weights=tuple(cfg.MODEL.BBOX_REG_WEIGHTS),
        faster_rcnn=cfg.MODEL.FASTER_RCNN or rpn_only,
        rpn_only=rpn_only,
        rpn_sizes=tuple(cfg.RPN.SIZES),
        rpn_stride=cfg.RPN.STRIDE,
        rpn_aspect_ratios=tuple(cfg.RPN.ASPECT_RATIOS),
        rpn_straddle_thresh=float(cfg.TRAIN.RPN_STRADDLE_THRESH),
        rpn_positive_overlap=cfg.TRAIN.RPN_POSITIVE_OVERLAP,
        rpn_negative_overlap=cfg.TRAIN.RPN_NEGATIVE_OVERLAP,
        rpn_fg_fraction=cfg.TRAIN.RPN_FG_FRACTION,
        rpn_batch_size=cfg.TRAIN.RPN_BATCH_SIZE_PER_IM,
        rpn_pre_nms_top_n=cfg.TRAIN.RPN_PRE_NMS_TOP_N,
        rpn_post_nms_top_n=cfg.TRAIN.RPN_POST_NMS_TOP_N,
        rpn_test_pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
        rpn_test_post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
        rpn_nms_thresh=cfg.TRAIN.RPN_NMS_THRESH,
        rpn_test_nms_thresh=cfg.TEST.RPN_NMS_THRESH,
        rpn_min_size=float(cfg.TRAIN.RPN_MIN_SIZE),
        frcnn_batch_size=cfg.TRAIN.BATCH_SIZE_PER_IM,
        frcnn_fg_fraction=cfg.TRAIN.FG_FRACTION,
        frcnn_fg_thresh=cfg.TRAIN.FG_THRESH,
        frcnn_bg_thresh_hi=cfg.TRAIN.BG_THRESH_HI,
        frcnn_bg_thresh_lo=cfg.TRAIN.BG_THRESH_LO,
        fpn_dim=cfg.FPN.DIM,
        fpn_roi_min_level=cfg.FPN.ROI_MIN_LEVEL,
        fpn_roi_max_level=cfg.FPN.ROI_MAX_LEVEL,
        fpn_rpn_min_level=cfg.FPN.RPN_MIN_LEVEL,
        fpn_rpn_max_level=cfg.FPN.RPN_MAX_LEVEL,
        fpn_canonical_scale=cfg.FPN.ROI_CANONICAL_SCALE,
        fpn_canonical_level=cfg.FPN.ROI_CANONICAL_LEVEL,
        fpn_extra_conv_levels=(cfg.FPN.EXTRA_CONV_LEVELS or retinanet or
                               retinanet_wsl),
        fpn_rpn_anchor_start_size=cfg.FPN.RPN_ANCHOR_START_SIZE,
        fpn_rpn_aspect_ratios=tuple(cfg.FPN.RPN_ASPECT_RATIOS),
        retinanet=retinanet,
        retinanet_wsl=retinanet_wsl,
        retinanet_aspect_ratios=tuple(cfg.RETINANET.ASPECT_RATIOS),
        retinanet_scales_per_octave=cfg.RETINANET.SCALES_PER_OCTAVE,
        retinanet_anchor_scale=cfg.RETINANET.ANCHOR_SCALE,
        retinanet_num_convs=cfg.RETINANET.NUM_CONVS,
        retinanet_prior_prob=cfg.RETINANET.PRIOR_PROB,
        retinanet_loss_alpha=cfg.RETINANET.LOSS_ALPHA,
        retinanet_loss_gamma=cfg.RETINANET.LOSS_GAMMA,
        retinanet_bbox_reg_beta=cfg.RETINANET.BBOX_REG_BETA,
        retinanet_bbox_reg_weight=cfg.RETINANET.BBOX_REG_WEIGHT,
        retinanet_class_specific_bbox=cfg.RETINANET.CLASS_SPECIFIC_BBOX,
        retinanet_positive_overlap=cfg.RETINANET.POSITIVE_OVERLAP,
        retinanet_negative_overlap=cfg.RETINANET.NEGATIVE_OVERLAP,
        retinanet_inference_th=cfg.RETINANET.INFERENCE_TH,
        retinanet_pre_nms_top_n=cfg.RETINANET.PRE_NMS_TOP_N,
    )


def _resnet_depth(conv_body):
    for d in ('152', '101', '18', '50'):
        if d in conv_body:
            return 'resnet' + d
    return 'resnet50'


# MRCNN.ROI_MASK_HEAD function names -> (mask_head, num_convs, gn). Both the
# supervised registry (mask_rcnn_heads.py:112-300) and the WSL twins
# (wsl_seg_heads.py:514-752); unlisted names raise rather than silently
# building a different architecture.
_MASK_HEAD_VARIANTS = {
    'mask_rcnn_fcn_head': ('fcn', 2, False),
    'mask_rcnn_fcn_head_v1up': ('fcn', 2, False),
    'mask_rcnn_fcn_head_v1up4convs': ('fcn', 4, False),
    'mask_rcnn_fcn_head_v1up4convs_gn': ('fcn', 4, True),
    'mask_rcnn_fcn_head_v0up': ('v0up', 0, False),
    'mask_rcnn_fcn_head_v0upshare': ('v0upshare', 0, False),
    # pre-rename aliases still honored by the reference for legacy YAMLs
    # (modeling/name_compat.py:40-55)
    'ResNet_mask_rcnn_fcn_head_v1up': ('fcn', 2, False),
    'ResNet_mask_rcnn_fcn_head_v1up4convs': ('fcn', 4, False),
    'ResNet_mask_rcnn_fcn_head_v0up': ('v0up', 0, False),
    'ResNet_mask_rcnn_fcn_head_v0upshare': ('v0upshare', 0, False),
}


def _mask_head_fields(roi_mask_head, mask_on):
    """Resolve MRCNN.ROI_MASK_HEAD to ModelSpec mask-architecture fields."""
    if not mask_on or not roi_mask_head:
        return dict(mask_head='fcn', mask_num_convs=2, mask_gn=False)
    name = roi_mask_head.rsplit('.', 1)[-1]
    if 'deeplab' in name:
        return dict(mask_head='deeplab', mask_num_convs=2, mask_gn=False)
    if name not in _MASK_HEAD_VARIANTS:
        raise NotImplementedError(
            'MRCNN.ROI_MASK_HEAD {!r} is not implemented (supported: '
            '{} and the deeplab heads)'.format(
                roi_mask_head, sorted(_MASK_HEAD_VARIANTS)))
    head, num_convs, gn = _MASK_HEAD_VARIANTS[name]
    return dict(mask_head=head, mask_num_convs=num_convs, mask_gn=gn)


def init_params(spec: ModelSpec, rng):
    r1, r2 = jax.random.split(rng)
    if spec.is_fpn:
        from nafwebsod_tpu.models import fpn, resnet
        depth = _resnet_depth(spec.conv_body)
        params = resnet.init_params(
            r1, depth, include_res5=True,
            num_groups=spec.resnets_num_groups,
            width_per_group=spec.resnets_width_per_group)
        dims = (resnet.SHALLOW_STAGE_DIMS if depth == 'resnet18'
                else resnet.STAGE_DIMS)
        lo, hi = spec.fpn_level_range
        params.update(fpn.init_params(
            jax.random.fold_in(r1, 23), dims, spec.fpn_dim,
            min_level=lo, max_level=hi,
            extra_conv_levels=spec.fpn_extra_conv_levels))
    elif spec.conv_body.startswith('resnet'):
        from nafwebsod_tpu.models import resnet
        depth = _resnet_depth(spec.conv_body)
        params = resnet.init_params(
            r1, depth, include_res5=spec.conv_body.endswith('c5'),
            num_groups=spec.resnets_num_groups,
            width_per_group=spec.resnets_width_per_group)
    elif spec.conv_body == 'vgg_cnn_m_c5':
        from nafwebsod_tpu.models import vgg_cnn_m
        params = vgg_cnn_m.init_params(r1)
    else:
        params = vgg16.init_params(r1, dilation=spec.dilation)
    if spec.retinanet:
        from nafwebsod_tpu.models import retinanet
        params.update(retinanet.init_params(jax.random.fold_in(r2, 29),
                                            spec))
        return params
    if spec.retinanet_wsl:
        from nafwebsod_tpu.models import retinanet_wsl
        params.update(retinanet_wsl.init_tower_params(
            jax.random.fold_in(r2, 31), spec.num_classes, spec.fpn_dim,
            spec.retinanet_num_convs))
        return params
    roi_feat_dim = (spec.body_out_dim * spec.roi_resolution *
                    spec.roi_resolution)
    if spec.rpn_only:
        pass  # RPN params only (added in the faster_rcnn block below)
    elif spec.box_head == 'xconv1fc_gn':
        params.update(heads.init_xconv1fc_gn_params(
            r2, spec.body_out_dim, resolution=spec.roi_resolution,
            conv_dim=spec.conv_head_dim, num_convs=spec.num_stacked_convs,
            mlp_dim=spec.hidden_dim))
    elif spec.box_head == 'res5_head':
        from nafwebsod_tpu.models import resnet
        params.update(resnet.init_res5_head_params(
            r2, _resnet_depth(spec.conv_body),
            num_groups=spec.resnets_num_groups,
            width_per_group=spec.resnets_width_per_group))
        if not spec.supervised:
            # WSL over the res5 head: WSDDN output layers on the pooled dim
            params.update({k: v for k, v in heads.init_head_params(
                jax.random.fold_in(r2, 43), spec.num_classes,
                roi_feat_dim=spec.hidden_dim, hidden=spec.hidden_dim,
                webly=False).items() if k.startswith('fc8')})
    elif not spec.rfcn:
        params.update(heads.init_head_params(
            r2, spec.num_classes, roi_feat_dim=roi_feat_dim,
            hidden=spec.hidden_dim,
            webly=spec.box_head == 'vgg16_2fc_noise',
            context=spec.is_context))
    if spec.refine_k:
        r3 = jax.random.fold_in(r2, 7)
        params.update(heads.init_refine_params(
            r3, spec.num_classes, hidden=spec.hidden_dim,
            k_refine=spec.refine_k))
    if spec.center_loss:
        cf, _ = center_ops.init_center_state(
            spec.num_classes, spec.center_loss_number, spec.hidden_dim,
            jax.random.fold_in(r2, 11))
        params['center_feature'] = cf
    if spec.rfcn:
        from nafwebsod_tpu.models import rfcn_head
        params.update(rfcn_head.init_rfcn_params(
            jax.random.fold_in(r2, 37), spec.body_out_dim,
            spec.num_classes, ps_grid=spec.rfcn_ps_grid,
            cls_agnostic_bbox=spec.cls_agnostic_bbox_reg))
    elif spec.supervised:
        k1, k2 = jax.random.split(jax.random.fold_in(r2, 17))
        num_reg = 2 if spec.cls_agnostic_bbox_reg else spec.num_classes
        params['cls_score_w'] = 0.01 * jax.random.normal(
            k1, (spec.hidden_dim, spec.num_classes))
        params['cls_score_b'] = jnp.zeros((spec.num_classes,))
        params['bbox_pred_w'] = 0.001 * jax.random.normal(
            k2, (spec.hidden_dim, 4 * num_reg))
        params['bbox_pred_b'] = jnp.zeros((4 * num_reg,))
        # the WSDDN output layers are not part of the supervised graph
        for k in ('fc8c_w', 'fc8c_b', 'fc8d_w', 'fc8d_b'):
            params.pop(k, None)
    if spec.keypoints_on:
        from nafwebsod_tpu.models import keypoint_head
        params.update(keypoint_head.init_keypoint_params(
            jax.random.fold_in(r2, 41), dim_in=spec.body_out_dim,
            hidden=spec.keypoint_conv_dim,
            num_convs=spec.keypoint_num_convs,
            num_keypoints=spec.num_keypoints,
            deconv_dim=spec.keypoint_deconv_dim))
    if spec.faster_rcnn:
        from nafwebsod_tpu.models import rpn_head
        if spec.is_fpn:
            # FPN RPN: one anchor size per level -> A = len(aspect_ratios),
            # conv weights shared across levels (FPN.py add_fpn_rpn_outputs)
            num_anchors = len(spec.fpn_rpn_aspect_ratios)
        else:
            num_anchors = len(spec.rpn_sizes) * len(spec.rpn_aspect_ratios)
        params.update(rpn_head.init_rpn_params(
            jax.random.fold_in(r2, 19), spec.body_out_dim, num_anchors))
    if spec.mask_on:
        from nafwebsod_tpu.models import seg_head
        if spec.mask_head == 'deeplab':
            params.update(seg_head.init_deeplab_head_params(
                jax.random.fold_in(r2, 13), spec.num_classes,
                dim_in=spec.body_out_dim))
        elif spec.mask_head in ('v0up', 'v0upshare'):
            if spec.mask_head == 'v0upshare':
                # weight sharing with the conv5 box head
                # (mask_rcnn_heads.py:238-263) requires that head to exist
                assert spec.box_head == 'res5_head', \
                    'v0upshare shares res5 with the box head — use the ' \
                    'ResNet.add_ResNet_roi_conv5_head box head'
            params.update(seg_head.init_mask_v0up_params(
                jax.random.fold_in(r2, 13), spec.num_classes,
                dim_reduced=spec.mask_dim_reduced,
                depth=_resnet_depth(spec.conv_body),
                share_res5=spec.mask_head == 'v0upshare',
                num_groups=spec.resnets_num_groups,
                width_per_group=spec.resnets_width_per_group))
        else:
            params.update(seg_head.init_mask_head_params(
                jax.random.fold_in(r2, 13), spec.num_classes,
                dim_in=spec.body_out_dim, dim_inner=spec.mask_dim_reduced,
                num_convs=spec.mask_num_convs, gn=spec.mask_gn))
    return params


def _apply_mask_head(spec: ModelSpec, params, pooled):
    """Run the configured mask-head architecture over pooled mask-RoI
    features (dispatch on the ModelSpec fields derived from
    MRCNN.ROI_MASK_HEAD)."""
    from nafwebsod_tpu.models import seg_head
    return seg_head.mask_head_from_pooled(
        params, pooled, dilation=spec.mask_dilation,
        num_convs=spec.mask_num_convs, gn=spec.mask_gn,
        variant=spec.mask_head, depth=_resnet_depth(spec.conv_body),
        num_groups=spec.resnets_num_groups)


def _body_param_names(spec):
    """All param names belonging to the configured conv body, grouped by
    stage index (for FREEZE_AT)."""
    if spec.conv_body.startswith('resnet') or spec.is_fpn:
        from nafwebsod_tpu.models import resnet
        depth = _resnet_depth(spec.conv_body)
        names = resnet.param_shapes(
            depth,
            include_res5=spec.is_fpn or spec.conv_body.endswith('c5'),
            num_groups=spec.resnets_num_groups,
            width_per_group=spec.resnets_width_per_group)

        def stage_of(name):
            if name.startswith('conv1') or name.startswith('res_conv1'):
                return 0
            return int(name[3]) - 1  # res2_* -> stage 1, etc.
        return {n: stage_of(n) for n in names}
    if spec.conv_body == 'vgg_cnn_m_c5':
        from nafwebsod_tpu.models import vgg_cnn_m
        return {n: 0 for n in vgg_cnn_m.param_shapes()}
    return {name + suffix: si
            for si, stage in enumerate(vgg16.VGG16_STAGES)
            for name, _, _ in stage for suffix in ('_w', '_b')}


def trainable_param_names(spec: ModelSpec, params):
    """Names of params the solver may update, mirroring the reference's
    TrainableParams bookkeeping (detector.py:68-79): with FREEZE_CONV_BODY the
    whole conv body is excluded; otherwise stages up to FREEZE_AT are."""
    body_stage = _body_param_names(spec)
    out = set()
    # FPN pyramid convs are trainable head-side params (never frozen by
    # FREEZE_AT, which indexes backbone stages) — they fall through the
    # body_stage lookup below as head params, as intended.
    for name in params:
        stage_idx = body_stage.get(name)
        if stage_idx is None:
            out.add(name)  # head param
        elif spec.freeze_conv_body or stage_idx < spec.freeze_at:
            continue
        else:
            out.add(name)
    # center features are COMPUTED params: updated by the center rule, not SGD
    out.discard('center_feature')
    return out


def shadow_weight_names(spec: ModelSpec, params):
    """Weight leaves safe to carry as pre-cast compute-dtype shadow copies.

    Every use of these leaves in the forward is ``w.astype(x.dtype)``
    (``vgg16._conv`` operands, ``heads._fc``), so substituting a pre-cast
    bfloat16 copy is a numeric no-op — the in-graph ``astype`` becomes the
    identity — while removing the per-step fp32->bf16 weight convert
    (~530 MB of HBM reads at flagship shapes: 2x 25088x4096 fc6 towers plus
    the VGG16 conv stack) from the forward. The train step keeps the master
    fp32 params for the Caffe-momentum update and recomputes the shadow of
    each TRAINABLE leaf after the update; frozen leaves' shadows are carried
    unchanged, so the frozen conv body is cast exactly once per run instead
    of once per step. See ``parallel/train_step.py`` (TPU.SHADOW_BF16).

    Restricted to the flagship operating point (VGG16-C5 body + fc6/fc7
    towers) where the substitution has been validated; other bodies return
    an empty set and take the original per-step cast path.
    """
    if spec.compute_dtype != 'bfloat16':
        return frozenset()
    if spec.conv_body != 'vgg16_c5':
        return frozenset()
    if spec.box_head not in ('vgg16_2fc', 'vgg16_2fc_noise',
                             'vgg16_context_2fc'):
        return frozenset()
    # exact names only: 'conv5_mask_w' (seg head), 'conv_rpn_w' (RPN head)
    # and the deeplab 'fc6_<k>_w' ASPP convs are consumed without the
    # astype(x.dtype) pattern and MUST NOT be substituted
    names = {s[0] + '_w' for stage in vgg16.VGG16_STAGES for s in stage}
    names |= {'fc6_w', 'fc7_w', '_[noisy]_fc6_w', '_[noisy]_fc7_w',
              # stacked-tower layout (TPU.STACKED_TOWERS): consumed via the
              # same astype(x.dtype) pattern in the stacked head branch
              'fc6s_w', 'fc7s_w'}
    return frozenset(n for n in names if n in params)


# TPU.STACKED_TOWERS param-layout transform: the dual noise-aware fc towers
# (webly_heads.py:463-502) consume the SAME boosted RoI features, so their
# GEMMs fuse into one width-doubled fc6 dot + one batched fc7 matmul. The
# earlier FUSED_NOISE_TOWER experiment lost to the PER-STEP fp32 weight
# concat (BASELINE.md negative results); storing the stacked layout as the
# canonical in-memory pytree removes that traffic entirely. The ON-DISK
# checkpoint schema is unchanged: engine/train joins after init/load and
# splits before every pkl write, so reference-format interchange holds.
# Layouts: fc6s_w (roi_dim, 2H) / fc6s_b (2H,) concat [clean | noisy];
# fc7s_w (2, H, H) / fc7s_b (2, H) stacked [clean, noisy].
_TOWER_STACKS = (
    ('fc6s_w', ('fc6_w', '_[noisy]_fc6_w'), 1, False),
    ('fc6s_b', ('fc6_b', '_[noisy]_fc6_b'), 0, False),
    ('fc7s_w', ('fc7_w', '_[noisy]_fc7_w'), 0, True),
    ('fc7s_b', ('fc7_b', '_[noisy]_fc7_b'), 0, True),
)


def stack_tower_params(tree, fill_missing_with_zeros=False):
    """Join per-tower fc leaves into the stacked layout (new dict).

    Works on any dict keyed by param names (params or momentum buffers); a
    stacked leaf is only formed when BOTH source towers are present, so
    partial momentum dicts from old checkpoints pass through untouched.
    ``fill_missing_with_zeros``: when exactly one tower of a pair is
    present (a checkpoint whose noisy tower was shared-init aliased and
    therefore carries no noisy momentum, utils/checkpoint.py), treat the
    absent one as zeros — matching the reference, where an aliased blob's
    momentum starts at zero.
    """
    out = dict(tree)
    for stacked_name, (clean, noisy), axis, use_stack in _TOWER_STACKS:
        if fill_missing_with_zeros and (clean in out) != (noisy in out):
            present = out[clean if clean in out else noisy]
            absent = clean if clean not in out else noisy
            out[absent] = np.zeros_like(np.asarray(present))
        if clean in out and noisy in out:
            a, b = np.asarray(out.pop(clean)), np.asarray(out.pop(noisy))
            out[stacked_name] = (np.stack([a, b], axis=0) if use_stack
                                 else np.concatenate([a, b], axis=axis))
    return out


def unstack_tower_params(tree):
    """Split stacked tower leaves back into the reference per-tower blobs
    (inverse of :func:`stack_tower_params`; new dict)."""
    out = dict(tree)
    for stacked_name, (clean, noisy), axis, use_stack in _TOWER_STACKS:
        if stacked_name in out:
            s = np.asarray(out.pop(stacked_name))
            if use_stack:
                out[clean], out[noisy] = s[0], s[1]
            else:
                half = s.shape[axis] // 2
                out[clean] = np.take(s, np.arange(half), axis=axis)
                out[noisy] = np.take(s, np.arange(half, 2 * half), axis=axis)
    return out


def body_forward_fpn(spec, params, image):
    """FPN body: ResNet stages -> pyramid. Returns (levels dict, scales
    dict), both keyed by pyramid level.

    With ``spec.remat_body`` (TPU.REMAT_BODY) the whole body is wrapped in
    ``jax.checkpoint``: the backward pass recomputes the conv activations
    instead of keeping them live — the standard XLA rematerialization trade
    (FLOPs for HBM) for training large images with an unfrozen body."""
    if spec.remat_body:
        from dataclasses import replace as dc_replace
        inner = dc_replace(spec, remat_body=False)
        levels = jax.checkpoint(
            lambda p, im: body_forward_fpn(inner, p, im)[0])(params, image)
        return levels, {k: 1.0 / (2 ** k) for k in levels}
    from nafwebsod_tpu.models import fpn, resnet

    dtype = jnp.bfloat16 if spec.compute_dtype == 'bfloat16' else jnp.float32
    x = image.astype(dtype)
    depth = _resnet_depth(spec.conv_body)
    stages, _ = resnet.forward(params, x, depth, include_res5=True,
                               freeze_at=spec.freeze_at, return_stages=True,
                               stride_1x1=spec.resnets_stride_1x1,
                               num_groups=spec.resnets_num_groups)
    lo, hi = spec.fpn_level_range
    return fpn.forward(params, stages, spec.fpn_dim, min_level=lo,
                       max_level=hi,
                       extra_conv_levels=spec.fpn_extra_conv_levels)


def body_forward(spec, params, image):
    """Dispatch to the configured conv body. Returns (feat NHWC, scale).

    ``spec.remat_body`` (TPU.REMAT_BODY) wraps the body in
    ``jax.checkpoint`` — backward recomputes conv activations instead of
    storing them (HBM-for-FLOPs, useful with an unfrozen body at large
    image sizes). The spatial scale stays a static Python float."""
    if spec.remat_body:
        from dataclasses import replace as dc_replace
        inner = dc_replace(spec, remat_body=False)
        feat = jax.checkpoint(
            lambda p, im: body_forward(inner, p, im)[0])(params, image)
        return feat, body_spatial_scale(spec)
    dtype = jnp.bfloat16 if spec.compute_dtype == 'bfloat16' else jnp.float32
    x = image.astype(dtype)
    if spec.conv_body.startswith('resnet'):
        from nafwebsod_tpu.models import resnet
        depth = _resnet_depth(spec.conv_body)
        feat, _, scale = resnet.forward(
            params, x, depth, include_res5=spec.conv_body.endswith('c5'),
            res5_dilation=spec.dilation if spec.dilation > 1 else 1,
            freeze_at=spec.freeze_at,
            stride_1x1=spec.resnets_stride_1x1,
            num_groups=spec.resnets_num_groups)
        return feat, scale
    if spec.conv_body == 'vgg_cnn_m_c5':
        from nafwebsod_tpu.models import vgg_cnn_m
        feat, _, scale = vgg_cnn_m.forward(params, x)
        return feat, scale
    return vgg16.forward(params, x, dilation=spec.dilation,
                         freeze_at=spec.freeze_at)


def body_spatial_scale(spec):
    """Static feature stride of the configured body."""
    if spec.conv_body in ('resnet50_c5', 'resnet101_c5', 'resnet18_c5'):
        return 1.0 / 32.0 * (spec.dilation if spec.dilation > 1 else 1)
    if spec.conv_body in ('resnet50_c4', 'resnet101_c4', 'resnet18_c4',
                          'vgg_cnn_m_c5'):
        return 1.0 / 16.0
    return 1.0 / 8.0 if spec.dilation == 2 else 1.0 / 16.0


from functools import lru_cache


@lru_cache(maxsize=None)
def _base_anchors(sizes, aspect_ratios, stride):
    """Matlab-matched base anchors as a trace-time constant."""
    from nafwebsod_tpu.ops import rpn as rpn_host
    return rpn_host.generate_anchors(stride, sizes, aspect_ratios)


def _rpn_forward(spec, params, feat):
    """RPN conv head over the body features + the full anchor grid.

    Returns (cls_logits (1,H,W,A), bbox_pred (1,H,W,4A), probs (N,),
    deltas (N,4), anchors (N,4)) with N = H*W*A in (H, W, A) order — the
    same flattening the reference's GenerateProposalsOp applies to the
    NCHW conv outputs (generate_proposals.py:47-60)."""
    from nafwebsod_tpu.models import rpn_head
    from nafwebsod_tpu.ops import rpn_device

    cls_l, bbox_l = rpn_head.forward(params, feat)
    base = _base_anchors(spec.rpn_sizes, spec.rpn_aspect_ratios,
                         spec.rpn_stride)
    anchors = rpn_device.shifted_anchors(
        cls_l.shape[1], cls_l.shape[2], spec.rpn_stride, base)
    probs = jax.nn.sigmoid(cls_l.reshape(-1))
    deltas = bbox_l.reshape(-1, 4)
    return cls_l, bbox_l, probs, deltas, anchors


def _fpn_rpn_forward(spec, params, levels):
    """Shared RPN conv head over the pyramid levels
    (FPN.py add_fpn_rpn_outputs: one weight set, applied per level; one
    anchor size per level = RPN_ANCHOR_START_SIZE * 2^(lvl - min)).

    Returns dict with concatenated flat 'logits' (N,), 'deltas' (N, 4),
    'anchors' (N, 4) in level order, plus 'per_level'
    [(probs, deltas, anchors), ...] for per-level proposal generation."""
    from nafwebsod_tpu.models import rpn_head
    from nafwebsod_tpu.ops import rpn_device

    logits_all, deltas_all, anchors_all, per_level = [], [], [], []
    for lvl in range(spec.fpn_rpn_min_level, spec.fpn_rpn_max_level + 1):
        cls_l, bbox_l = rpn_head.forward(params, levels[lvl])
        stride = 2.0 ** lvl
        size = (spec.fpn_rpn_anchor_start_size *
                2 ** (lvl - spec.fpn_rpn_min_level))
        base = _base_anchors((size,), spec.fpn_rpn_aspect_ratios,
                             int(stride))
        anchors = rpn_device.shifted_anchors(
            cls_l.shape[1], cls_l.shape[2], stride, base)
        logits = cls_l.reshape(-1)
        deltas = bbox_l.reshape(-1, 4)
        logits_all.append(logits)
        deltas_all.append(deltas)
        anchors_all.append(anchors)
        per_level.append((jax.nn.sigmoid(logits), deltas, anchors))
    return {
        'logits': jnp.concatenate(logits_all),
        'deltas': jnp.concatenate(deltas_all),
        'anchors': jnp.concatenate(anchors_all),
        'per_level': per_level,
    }


def _fpn_collect_proposals(spec, per_level, im_info, train):
    """Per-level GenerateProposals + overall top-k collection
    (collect_and_distribute_fpn_rpn_proposals.py: per-level NMS, union,
    keep the top POST_NMS_TOP_N by score; distribution back to levels
    happens inside the multilevel RoI transform)."""
    from nafwebsod_tpu.ops import rpn_device

    sg = jax.lax.stop_gradient
    pre = spec.rpn_pre_nms_top_n if train else spec.rpn_test_pre_nms_top_n
    post = (spec.rpn_post_nms_top_n if train
            else spec.rpn_test_post_nms_top_n)
    thresh = spec.rpn_nms_thresh if train else spec.rpn_test_nms_thresh
    props, scores, valid = [], [], []
    for probs_i, deltas_i, anchors_i in per_level:
        p, s, v = rpn_device.generate_proposals(
            sg(probs_i), sg(deltas_i), anchors_i,
            im_info[0], im_info[1], im_info[2],
            pre_nms_top_n=pre, post_nms_top_n=post,
            nms_thresh=thresh, min_size=spec.rpn_min_size)
        props.append(p)
        scores.append(s)
        valid.append(v)
    props = jnp.concatenate(props)
    scores = jnp.concatenate(scores)
    valid = jnp.concatenate(valid)
    k = min(post, props.shape[0])
    masked = jnp.where(valid, scores, -jnp.inf)
    top_s, idx = jax.lax.top_k(masked, k)
    v = jnp.isfinite(top_s)
    return (jnp.where(v[:, None], props[idx], 0.0),
            jnp.where(v, top_s, 0.0), v)


def _fast_rcnn_outputs(spec, params, fc7):
    """cls_score softmax + bbox_pred deltas (fast_rcnn_heads.py:45-72)."""
    logits = heads._fc(fc7, params, 'cls_score', out_dtype=jnp.float32)
    bbox_pred = heads._fc(fc7, params, 'bbox_pred', out_dtype=jnp.float32)
    return logits, bbox_pred


def _box_outputs(spec, params, fc7, feat, rois, spatial_scale):
    """cls logits + bbox deltas from either the fc tower (Fast R-CNN) or
    the position-sensitive R-FCN maps (rfcn_heads.py:29-99)."""
    if spec.rfcn:
        from nafwebsod_tpu.models import rfcn_head
        return rfcn_head.forward(
            params, feat, rois, spec.num_classes, ps_grid=spec.rfcn_ps_grid,
            spatial_scale=spatial_scale,
            cls_agnostic_bbox=spec.cls_agnostic_bbox_reg)
    return _fast_rcnn_outputs(spec, params, fc7)


def _fast_rcnn_losses(spec, logits, bbox_pred, labels, bbox_targets,
                      bbox_iw, bbox_ow, valid):
    """Supervised box-head losses (fast_rcnn_heads.py:75-93)."""
    loss_cls = loss_ops.softmax_with_loss(logits, labels, valid)
    loss_bbox = loss_ops.smooth_l1_loss(
        bbox_pred, bbox_targets, bbox_iw, bbox_ow, valid_mask=valid)
    acc = jnp.sum((jnp.argmax(logits, 1) == labels) *
                  (valid if valid is not None else 1.0))
    n = (jnp.sum(valid) if valid is not None else labels.shape[0])
    aux = {'loss_cls': loss_cls, 'loss_bbox': loss_bbox,
           'accuracy_cls': acc / jnp.maximum(n, 1)}
    return loss_cls + loss_bbox, aux


def _fpn_head_tower(spec, params, levels, scales, rois, obn_scores, train,
                    rng):
    """Multilevel RoI transform + fc tower(s) for FPN bodies
    (detector.py:268-331 FPN-aware RoIFeatureTransform)."""
    from nafwebsod_tpu.models import fpn

    pooled = fpn.multilevel_roi_pool(
        levels, scales, rois, obn_scores,
        k_min=spec.fpn_roi_min_level, k_max=spec.fpn_roi_max_level,
        method=spec.roi_xform_method, resolution=spec.roi_resolution,
        sampling_ratio=spec.roi_sampling_ratio,
        canonical_scale=spec.fpn_canonical_scale,
        canonical_level=spec.fpn_canonical_level,
        freeze_body=spec.freeze_conv_body,
        flatten=spec.box_head != 'xconv1fc_gn')
    if spec.box_head == 'xconv1fc_gn':
        return heads.xconv1fc_gn_head(
            params, pooled, num_convs=spec.num_stacked_convs), None
    if spec.box_head == 'vgg16_2fc_noise':
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        clean = heads._fc_tower(pooled, params, '', r1, train)
        noisy = heads._fc_tower(pooled, params, '_[noisy]_', r2, train)
        return clean, noisy
    return heads._fc_tower(pooled, params, '', rng, train), None


def _res5_tower(spec, params, feat, rois, obn_scores, spatial_scale):
    """RoI transform + res5 stage + global avg pool — the C4 conv5 box head
    (ResNet.add_ResNet_roi_conv5_head)."""
    from nafwebsod_tpu.models import resnet
    from nafwebsod_tpu.ops.roi_pool import (roi_align, roi_feature_boost,
                                            roi_pool)

    f = feat[0]
    if spec.roi_xform_method == 'RoIAlign':
        pooled = roi_align(f, rois, spec.roi_resolution, spec.roi_resolution,
                           spatial_scale, max(spec.roi_sampling_ratio, 1))
    else:
        pooled = roi_pool(f, rois, spec.roi_resolution, spec.roi_resolution,
                          spatial_scale)
    pooled = roi_feature_boost(pooled, obn_scores)
    if spec.freeze_conv_body:
        pooled = jax.lax.stop_gradient(pooled)
    return resnet.roi_res5_forward(
        params, pooled, _resnet_depth(spec.conv_body),
        stride_1x1=spec.resnets_stride_1x1,
        num_groups=spec.resnets_num_groups)


def _run_body_and_head(spec, params, image, rois, obn_scores, train, rng,
                       im_hw=None):
    """``im_hw``: optional true (h, w) of the image inside the padded
    canvas — the context head's outer rings clip at the IMAGE edge like
    the reference's single-image blob (roi_context_op.cu:10-84), not at
    the zero-padded canvas edge where RoILoopPool would sample dead
    border-bleed activations."""
    if spec.is_fpn:
        levels, scales = body_forward_fpn(spec, params, image)
        fc7_clean, fc7_noisy = _fpn_head_tower(
            spec, params, levels, scales, rois, obn_scores, train, rng)
        return fc7_clean, fc7_noisy, levels
    feat, spatial_scale = body_forward(spec, params, image)
    if spec.freeze_conv_body:
        feat = jax.lax.stop_gradient(feat)
    # fc towers run in the compute dtype (bf16 on TPU) with fp32 MXU
    # accumulation; heads.py casts the fc8 logits to fp32 before the softmax
    # pair, so the RoI-dim softmax numerics stay fp32 (SURVEY.md §7).
    kwargs = dict(method=spec.roi_xform_method, resolution=spec.roi_resolution,
                  sampling_ratio=spec.roi_sampling_ratio,
                  freeze_body=spec.freeze_conv_body, train=train, rng=rng)
    if spec.is_context:
        ih = image.shape[1] if im_hw is None else im_hw[0]
        iw = image.shape[2] if im_hw is None else im_hw[1]
        fc7s = heads.vgg16_roi_context_2fc_head(
            params, feat, rois, obn_scores, spatial_scale,
            ih, iw,
            context_ratio=spec.context_ratio,
            resolution=spec.roi_resolution,
            freeze_body=spec.freeze_conv_body, train=train, rng=rng)
        return fc7s, None, feat
    if spec.box_head == 'vgg16_2fc_noise':
        (fc7_clean, fc7_noisy), _ = heads.vgg16_roi_2fc_noise_head(
            params, feat, rois, obn_scores, spatial_scale,
            fused=spec.fused_noise_tower, fused_fc7=spec.fused_fc7,
            **kwargs)
        return fc7_clean, fc7_noisy, feat
    if spec.box_head == 'res5_head':
        fc7 = _res5_tower(spec, params, feat, rois, obn_scores,
                          spatial_scale)
        return fc7, None, feat
    if spec.box_head == 'xconv1fc_gn':
        pooled = heads.roi_transform(
            feat[0], rois, obn_scores, spatial_scale,
            spec.roi_xform_method, spec.roi_resolution,
            spec.roi_sampling_ratio, spec.freeze_conv_body, flatten=False)
        fc7 = heads.xconv1fc_gn_head(params, pooled,
                                     num_convs=spec.num_stacked_convs)
        return fc7, None, feat
    fc7, _ = heads.vgg16_roi_2fc_head(
        params, feat, rois, obn_scores, spatial_scale, **kwargs)
    return fc7, None, feat


@partial(jax.jit, static_argnames=('spec',))
def forward_test(spec: ModelSpec, params, image, rois, obn_scores,
                 valid_mask=None, im_info=None, im_hw=None):
    """Per-image inference. Returns per-RoI class scores (R, num_classes).

    Without a refinement ladder the scores are the WSDDN rois_pred with a
    dummy background column prepended (wsl_heads.py:58-67); with OICR / PCL /
    C-MIL they are the mean of the refinement softmaxes
    (wsl_heads.py:125-180, test branches).

    With spec.faster_rcnn the input rois are ignored: the RPN generates the
    proposals in-graph (model_builder.py:74-112 inference); ``im_info``
    (h, w, scale) is required for clipping/min-size. The returned dict gains
    'rois' (P, 5) in scaled-image coords and 'proposal_valid' (P,)."""
    if spec.retinanet:
        from nafwebsod_tpu.models import retinanet
        levels, _ = body_forward_fpn(spec, params, image)
        cls_out, bbox_out = retinanet.head_forward(spec, params, levels)
        return {'retnet_cls_prob': {l: jax.nn.sigmoid(v)
                                    for l, v in cls_out.items()},
                'retnet_bbox_pred': bbox_out}
    if spec.retinanet_wsl:
        from nafwebsod_tpu.models import retinanet_wsl
        levels, _ = body_forward_fpn(spec, params, image)
        maps, img_scores = retinanet_wsl.tower_outputs(
            params, levels, spec.retinanet_num_convs)
        return {'retnet_cls_prob': maps, 'img_scores': img_scores}
    if spec.faster_rcnn:
        from nafwebsod_tpu.ops import rpn_device

        if spec.is_fpn:
            levels, scales = body_forward_fpn(spec, params, image)
            rp = _fpn_rpn_forward(spec, params, levels)
            props, pscores, pvalid = _fpn_collect_proposals(
                spec, rp['per_level'], im_info, train=False)
        else:
            feat, spatial_scale = body_forward(spec, params, image)
            if spec.freeze_conv_body:
                feat = jax.lax.stop_gradient(feat)
            _, _, probs, deltas, anchors = _rpn_forward(spec, params, feat)
            props, pscores, pvalid = rpn_device.generate_proposals(
                probs, deltas, anchors, im_info[0], im_info[1], im_info[2],
                pre_nms_top_n=spec.rpn_test_pre_nms_top_n,
                post_nms_top_n=spec.rpn_test_post_nms_top_n,
                nms_thresh=spec.rpn_test_nms_thresh,
                min_size=spec.rpn_min_size)
        rois5 = jnp.concatenate(
            [jnp.zeros((props.shape[0], 1)), props], axis=1)
        if spec.rpn_only:
            # proposal-generation model: no box head (rpn_generator.py)
            return {'rois': rois5, 'proposal_scores': pscores,
                    'proposal_valid': pvalid}
        obn = jnp.ones((props.shape[0], 1), jnp.float32)
        if spec.rfcn:
            logits, bbox_pred = _box_outputs(spec, params, None, feat,
                                             rois5, spatial_scale)
        else:
            if spec.is_fpn:
                fc7, _ = _fpn_head_tower(spec, params, levels, scales,
                                         rois5, obn, False, None)
            elif spec.box_head == 'res5_head':
                fc7 = _res5_tower(spec, params, feat, rois5, obn,
                                  spatial_scale)
            elif spec.box_head == 'xconv1fc_gn':
                pooled = heads.roi_transform(
                    feat[0], rois5, obn, spatial_scale,
                    spec.roi_xform_method, spec.roi_resolution,
                    spec.roi_sampling_ratio, spec.freeze_conv_body,
                    flatten=False)
                fc7 = heads.xconv1fc_gn_head(
                    params, pooled, num_convs=spec.num_stacked_convs)
            else:
                fc7, _ = heads.vgg16_roi_2fc_head(
                    params, feat, rois5, obn, spatial_scale,
                    method=spec.roi_xform_method,
                    resolution=spec.roi_resolution,
                    sampling_ratio=spec.roi_sampling_ratio,
                    freeze_body=spec.freeze_conv_body, train=False,
                    rng=None)
            logits, bbox_pred = _fast_rcnn_outputs(spec, params, fc7)
        scores = jax.nn.softmax(logits, axis=1) * pvalid[:, None]
        return {'scores': scores, 'bbox_pred': bbox_pred, 'rois': rois5,
                'proposal_valid': pvalid, 'rois_pred': scores[:, 1:]}
    if spec.supervised and spec.rfcn:
        feat, spatial_scale = body_forward(spec, params, image)
        if spec.freeze_conv_body:
            feat = jax.lax.stop_gradient(feat)
        logits, bbox_pred = _box_outputs(spec, params, None, feat, rois,
                                         spatial_scale)
        probs = jax.nn.softmax(logits, axis=1)
        if valid_mask is not None:
            probs = probs * valid_mask[:, None]
        return {'scores': probs, 'bbox_pred': bbox_pred,
                'rois_pred': probs[:, 1:]}
    fc7_clean, fc7_noisy, feat = _run_body_and_head(
        spec, params, image, rois, obn_scores, train=False, rng=None,
        im_hw=im_hw)
    if spec.supervised:
        logits = heads._fc(fc7_clean, params, 'cls_score',
                           out_dtype=jnp.float32)
        probs = jax.nn.softmax(logits, axis=1)
        bbox_pred = heads._fc(fc7_clean, params, 'bbox_pred',
                              out_dtype=jnp.float32)
        if valid_mask is not None:
            probs = probs * valid_mask[:, None]
        return {'scores': probs, 'bbox_pred': bbox_pred,
                'rois_pred': probs[:, 1:]}
    if spec.is_context:
        out = heads.wsl_context_outputs(params, fc7_clean, valid_mask)
        fc7_main = fc7_clean[0]
    elif fc7_noisy is not None:
        out = heads.webly_outputs(params, fc7_clean, fc7_noisy, valid_mask)
        fc7_main = fc7_clean
    else:
        out = heads.wsl_outputs(params, fc7_clean, valid_mask)
        fc7_main = fc7_clean
    if spec.refine_k:
        probs = [jax.nn.softmax(heads.refine_score(params, fc7_main, k),
                                axis=1)
                 for k in range(1, spec.refine_k + 1)]
        scores = sum(probs) / float(spec.refine_k)
        if valid_mask is not None:
            scores = scores * valid_mask[:, None]
    else:
        scores = heads.add_background_column(out['rois_pred'])
    return {'scores': scores, 'rois_pred': out['rois_pred']}


def _mask_pooled(spec, params, feat, rois):
    """Pooled RoI features for the mask head: single-scale RoIAlign or the
    FPN multilevel transform (``feat`` is the levels dict for FPN)."""
    from nafwebsod_tpu.ops.roi_pool import roi_align

    if spec.is_fpn:
        from nafwebsod_tpu.models import fpn
        scales = {k: 1.0 / (2 ** k) for k in feat}
        ones = jnp.ones((rois.shape[0], 1), jnp.float32)
        return fpn.multilevel_roi_pool(
            feat, scales, rois, ones,
            k_min=spec.fpn_roi_min_level, k_max=spec.fpn_roi_max_level,
            method='RoIAlign', resolution=spec.mask_resolution,
            sampling_ratio=2, canonical_scale=spec.fpn_canonical_scale,
            canonical_level=spec.fpn_canonical_level, flatten=False)
    # no f32 upcast of the FEATURES: the Pallas kernel keeps a bf16 block
    # resident in VMEM (half the window-copy bytes) and contracts in f32;
    # out_dtype=f32 returns that result un-rounded — bit-identical to the
    # old feat.astype(f32)-then-pool form (the f32 mask head consumes it)
    return roi_align(feat[0], rois,
                     spec.mask_resolution, spec.mask_resolution,
                     body_spatial_scale(spec), 2, out_dtype=jnp.float32)


@partial(jax.jit, static_argnames=('spec',))
def forward_masks(spec: ModelSpec, params, image, rois):
    """Soft masks for given (final-detection) rois (test_wsl.py
    im_detect_mask:411-470): fcn mask head + duplicated-bg-column sigmoid.
    Returns (R, M, M, num_classes)."""
    from nafwebsod_tpu.models import seg_head

    if spec.is_fpn:
        levels, _ = body_forward_fpn(spec, params, image)
        pooled = _mask_pooled(spec, params, levels, rois)
    else:
        feat, _ = body_forward(spec, params, image)
        pooled = _mask_pooled(spec, params, feat, rois)
    mask_logits = _apply_mask_head(spec, params, pooled)
    return seg_head.mask_probs_test(mask_logits)


@partial(jax.jit, static_argnames=('spec',))
def forward_deeplab_masks(spec: ModelSpec, params, image):
    """Test-time deeplab masks: ONE image-level bg/fg grid, not per-RoI
    (test_wsl.py:im_detect_mask_deeplab:366-405 fetches 'mask_fc8_bgfg' —
    wsl_seg_heads.py:add_deeplab_outputs:104-114 concat([1 - max_c
    sigmoid(mask_fc8), sigmoid(mask_fc8)])). Returns (1, h, w, C) f32 at
    the head grid; segm_results_deeplab resizes/binarizes per detection."""
    from nafwebsod_tpu.models import seg_head

    feat, _ = body_forward(spec, params, image)
    mask_fc8 = seg_head.deeplab_head_forward(
        params, feat, freeze_body=True, train=False)
    sig = jax.nn.sigmoid(mask_fc8)                       # (1, h, w, C-1)
    bg = 1.0 - jnp.max(sig, axis=-1, keepdims=True)
    return jnp.concatenate([bg, sig], axis=-1)


@partial(jax.jit, static_argnames=('spec',))
def forward_keypoints(spec: ModelSpec, params, image, rois):
    """Keypoint heatmaps for given (final-detection) rois
    (test.py im_detect_keypoints upstream). Returns (R, Hh, Wh, K)."""
    from nafwebsod_tpu.models import keypoint_head

    if spec.is_fpn:
        levels, scales = body_forward_fpn(spec, params, image)
        kfeat = levels[spec.fpn_roi_min_level][0]
        kscale = scales[spec.fpn_roi_min_level]
    else:
        kfeat_full, kscale = body_forward(spec, params, image)
        kfeat = kfeat_full[0]
    return keypoint_head.forward(
        params, kfeat.astype(jnp.float32), rois, kscale,
        resolution=spec.keypoint_resolution,
        num_convs=spec.keypoint_num_convs)


@partial(jax.jit, static_argnames=('spec',))
def forward_cpg_maps(spec: ModelSpec, params, image, rois, obn_scores,
                     valid, labels_oh, im_hw=None, rng=None):
    """CPG saliency maps for visualization (cpg_vis.py:save_cpg:135-152 —
    the reference dumps the CPG blob every WSL.SAMPLE_ITER when CPG/CSC is
    active). Recomputed off the hot path instead of exporting the maps from
    the train step. With ``rng`` the inner forward runs train=True so the
    dumped maps include dropout like the maps the CSC train step actually
    uses (the reference dumps from the live train net's blobs); the exact
    per-step key is consumed inside the jitted step, so callers pass a
    deterministic stand-in (engine/train._vis_sample folds the iter into
    the seed) — representative, not byte-identical to the in-step maps.
    Returns (maps (max_gt, H, W), class_idx, keep)."""
    from dataclasses import replace as dc_replace

    from nafwebsod_tpu.models import heads
    from nafwebsod_tpu.ops import cpg as cpg_ops

    unfrozen = dc_replace(spec, freeze_conv_body=False, freeze_at=0,
                          csc=False, cpg=False, mask_on=False)

    def cls_prob_fn(im):
        f7, _, _ = _run_body_and_head(unfrozen, params, im, rois,
                                      obn_scores, train=rng is not None,
                                      rng=rng, im_hw=im_hw)
        o = (heads.wsl_context_outputs(params, f7, valid)
             if spec.is_context else heads.wsl_outputs(params, f7, valid))
        return heads.cls_pred(o['rois_pred'])

    cls_prob = jax.lax.stop_gradient(cls_prob_fn(image))
    return cpg_ops.cpg_maps(cls_prob_fn, image, labels_oh, cls_prob,
                            tau=spec.cpg_tau, max_gt=spec.max_gt_cpg)


@partial(jax.jit, static_argnames=('spec',))
def forward_body_feat(spec: ModelSpec, params, image):
    """Conv-body feature map for visualization (feat_vis.py:feat_map_draw —
    channel-max conv5 rendering). Returns (1, H, W, C) float32 (the finest
    pyramid level for FPN bodies)."""
    if spec.is_fpn:
        levels, _ = body_forward_fpn(spec, params, image)
        return levels[min(levels)].astype(jnp.float32)
    feat, _ = body_forward(spec, params, image)
    return feat.astype(jnp.float32)


def _refinement_losses(spec, params, fc7, rois, out, cls_prob, labels_oh,
                       valid):
    """OICR / C-MIL / PCL refinement ladders (wsl_heads.py:456-607).

    Stage k's pseudo-labels come from stage k-1's softmax (stage 1 from the
    WSDDN rois_pred — for C-MIL the pre-merge 'cmil_rois_pred'); each stage
    is a SoftmaxWithLossN (or PCLLoss) over its own cls_score classifier.
    """
    from nafwebsod_tpu.ops.jbox import roi_iou

    losses = {}
    c = spec.num_classes
    sg = jax.lax.stop_gradient

    if spec.pcl:
        max_pc = refine_ops.PCL_MAX_PC_NUM * (c - 1)
        r = rois.shape[0]
        prev = sg(out['rois_pred'])
        for k in range(1, spec.refine_k + 1):
            logits = heads.refine_score(params, fc7, k)
            probs = jax.nn.softmax(logits, axis=1)

            def host_targets(boxes, prev_, loh, probs_, vmask,
                             _max_pc=max_pc):
                v = vmask.astype(bool)
                res = refine_ops.pcl_targets_padded(
                    boxes[v], prev_[v], loh, probs_[v], _max_pc)
                full = []
                for arr, fill in zip(res[:3], (0.0, 0.0, -1.0)):
                    y = np.full((len(v),), fill, np.float32)
                    y[v] = arr
                    full.append(y)
                return tuple(full) + res[3:]

            shapes = (
                jax.ShapeDtypeStruct((r,), jnp.float32),       # labels
                jax.ShapeDtypeStruct((r,), jnp.float32),       # cls_loss_w
                jax.ShapeDtypeStruct((r,), jnp.float32),       # gt_assignment
                jax.ShapeDtypeStruct((max_pc,), jnp.float32),  # pc_labels
                jax.ShapeDtypeStruct((max_pc,), jnp.float32),  # pc_probs
                jax.ShapeDtypeStruct((max_pc,), jnp.float32),  # pc_count
                jax.ShapeDtypeStruct((max_pc,), jnp.float32),  # img_cls_w
                jax.ShapeDtypeStruct((c,), jnp.float32),       # im_labels_real
            )
            vmask = valid if valid is not None else jnp.ones((r,), bool)
            if spec.pcl_device:
                # on-device pseudo-labeling (WSL.PCL_DEVICE): no host
                # round-trip per refinement stage
                targets = refine_ops.pcl_targets_device(
                    sg(rois[:, 1:5]), prev, labels_oh, sg(probs), vmask)
            else:
                targets = jax.pure_callback(
                    host_targets, shapes, sg(rois[:, 1:5]), prev, labels_oh,
                    sg(probs), vmask, vmap_method='sequential')
            (lbl, clw, ga, pcl_l, pcl_p, pcl_c, img_w, im_real) = targets
            # normalize by the ACTUAL proposal count (pcl_loss_op.cc
            # divides by dim32(0)); the padded static capacity would
            # rescale the loss by each image's padding ratio
            losses['loss_cls{}'.format(k)] = refine_ops.pcl_loss_full(
                probs, lbl, clw, ga, pcl_l, pcl_p, pcl_c, img_w, im_real,
                jnp.sum(vmask.astype(jnp.float32)))
            prev = sg(probs)
        return losses

    # OICR / C-MIL: RoILabel + SoftmaxWithLossN
    iou = roi_iou(rois)
    if spec.cmil:
        label_kwargs = dict(fg_thresh=0.6, bg_thresh_hi=0.4, bg_thresh_lo=0.1,
                            num_pos=32, num_neg=96)
        prev = sg(out['cmil_rois_pred'])
    else:
        label_kwargs = {}
        prev = sg(out['rois_pred'])
    # the reference always feeds cls_prob as RoILabel's 4th input
    # (wsl_heads.py:468-478,525-531), so per-RoI loss weights are the
    # image-level class probability of the assigned class
    cw = sg(cls_prob[0])
    for k in range(1, spec.refine_k + 1):
        lbl, w = refine_ops.roi_label(prev, iou, labels_oh,
                                      valid_mask=valid, class_weights=cw,
                                      **label_kwargs)
        logits = heads.refine_score(params, fc7, k)
        loss_k = loss_ops.softmax_with_loss_n(logits, lbl, w)
        if not spec.mean_loss:
            # get_loss_gradients_weighted scales the grad by (C-1)
            # (wsl_heads.py:500-505,615-621)
            loss_k = loss_k * float(c - 1)
        losses['loss_cls{}'.format(k)] = loss_k
        prev = sg(jax.nn.softmax(logits, axis=1))
    return losses


def fast_rcnn_tail_losses(spec: ModelSpec, params, batch, fc7):
    """Supervised Fast R-CNN tail downstream of the fc tower: cls_score /
    bbox_pred outputs + losses on precomputed-proposal blobs
    (fast_rcnn_heads.py:45-93). Shared by ``forward_train`` and the
    tensor-parallel / pipeline sharded steps (parallel/), which compute
    ``fc7`` their own way and reuse this exact tail so the supervised
    family inherits the unsharded numerics."""
    logits, bbox_pred = _fast_rcnn_outputs(spec, params, fc7)
    return _fast_rcnn_losses(
        spec, logits, bbox_pred, batch['labels_int32'],
        batch['bbox_targets'], batch['bbox_inside_weights'],
        batch['bbox_outside_weights'], batch.get('valid_mask'))


def wsl_tail_losses(spec: ModelSpec, params, batch, fc7_clean,
                    fc7_noisy, feat, rng):
    """WSL losses downstream of the fc towers (wsl_heads.py:456-607
    ladders + webly_heads.py:132-216 noise split + the CSC / seg /
    min-entropy / center branches). Shared tail: ``forward_train``
    computes the towers unsharded; the tensor-parallel and pipeline
    steps (parallel/tensor_shard.py, parallel/pipeline.py) compute
    them hidden-sharded — everything from the two-stream outputs down
    is identical, so sharded-step numerics inherit this code's parity
    pinning. ``feat`` may be None when the spec's scope guarantees no
    branch needs the conv features (the sharded steps' check_scope
    rejects csc/cpg/mask/center)."""
    image = batch['image']
    rois = batch['rois']
    obn = batch['obn_scores']
    labels_oh = batch['labels_oh']
    valid = batch.get('valid_mask')
    im_hw = batch.get('im_hw')
    fc7_main = fc7_clean[0] if spec.is_context else fc7_clean
    if spec.cmil:
        lam = refine_ops.cmil_lambda(
            batch.get('cur_iter', jnp.zeros(())), spec.size_epoch,
            max(spec.max_iter // spec.size_epoch, 1))
        out = heads.cmil_outputs(params, fc7_main, rois, valid, lam)
    elif spec.is_context:
        out = heads.wsl_context_outputs(params, fc7_clean, valid)
    elif fc7_noisy is not None:
        out = heads.webly_outputs(params, fc7_clean, fc7_noisy, valid)
    else:
        out = heads.wsl_outputs(params, fc7_clean, valid)

    cls_prob = heads.cls_pred(out['rois_pred'])
    aux = {}
    losses = {}

    if spec.refine_k:
        losses.update(_refinement_losses(
            spec, params, fc7_main, rois, out, cls_prob, labels_oh, valid))

    if spec.is_webly and 'rois_pred_noise' in out:
        cls_prob_noise = heads.cls_pred(out['rois_pred_noise'])
        if spec.webly_entropy:
            cw, cwn = spatial_entropy_weights(
                out['rois_pred'], cls_prob, rois, labels_oh, valid)
        else:
            cw = jnp.ones_like(labels_oh)
            cwn = jnp.ones_like(labels_oh)
        losses['loss_cls'] = loss_ops.weighted_cross_entropy_with_logits(
            cls_prob, labels_oh, cw, spec.mean_loss)
        losses['loss_cls_noise'] = loss_ops.weighted_cross_entropy_with_logits(
            cls_prob_noise, labels_oh, cwn, spec.mean_loss)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob, labels_oh)
        aux['accuracy_cls_noise'] = loss_ops.multilabel_accuracy(
            cls_prob_noise, labels_oh)
        aux['class_weight_mean'] = jnp.mean(cw)
        aux['class_weight_noise_mean'] = jnp.mean(cwn)
    elif spec.csc:
        # CSC replaces the plain CE with pos/neg constrained losses
        # (wsl_heads.py:375-407): CPG saliency -> per-RoI contrastive
        # weights -> polar-split rois_pred -> CE vs labels / zeros.
        from dataclasses import replace as dc_replace
        from nafwebsod_tpu.ops import cpg as cpg_ops

        unfrozen = dc_replace(spec, freeze_conv_body=False, freeze_at=0,
                              csc=False, cpg=False)
        # CSC weights are constants (see the stop_gradient on w below), so
        # the whole CPG computation must be opaque to the outer training
        # grad: stop-gradient the params it closes over, otherwise the
        # outer JVP traces the inner vjp's backward — which contains the
        # Pallas pool-backward kernel (no JVP rule) — and dies.
        params_sg = jax.tree.map(jax.lax.stop_gradient, params)

        # train=True with the SAME rng as the main tower: the reference's
        # nested CPG net shares the train net's forward blobs — dropout
        # masks included (cpg_utils.py:20 create_cpg_net builds it from
        # the train net) — so the faithful inner forward is IDENTICAL to
        # the main one. Being identical also makes the duplicate forward
        # CSE-able (stop_gradient is identity in HLO); measured
        # perf-neutral on-chip (86.5 vs 87-88 ms), so this is a parity
        # fix, not a speed lever — the speed lever is the per-seed cond
        # gating in cpg_maps (86.5 -> 65.9 ms).
        def cls_prob_fn(im):
            f7, _, _ = _run_body_and_head(unfrozen, params_sg, im, rois,
                                          obn, train=True, rng=rng,
                                          im_hw=im_hw)
            o = (heads.wsl_context_outputs(params_sg, f7, valid)
                 if spec.is_context
                 else heads.wsl_outputs(params_sg, f7, valid))
            return heads.cls_pred(o['rois_pred'])

        active = batch.get('cur_iter', jnp.zeros(())) < spec.csc_max_iter

        def compute_w(_):
            maps, idx, keep = cpg_ops.cpg_maps(
                cls_prob_fn, image, labels_oh,
                jax.lax.stop_gradient(cls_prob), tau=spec.cpg_tau,
                max_gt=spec.max_gt_cpg)
            w, _, _ = cpg_ops.csc_weights(
                maps, idx, keep, rois, labels_oh,
                jax.lax.stop_gradient(cls_prob),
                fg_threshold=spec.csc_fg_threshold,
                context_scale=1.8, valid_mask=valid)
            return w

        w = jax.lax.cond(
            active, compute_w,
            lambda _: jnp.ones((rois.shape[0], spec.num_classes - 1),
                               jnp.float32), None)
        # the reference's CSCConstraint gradient treats W as CONSTANT
        # (csc_constraint_op.cu backward propagates to rois_pred only);
        # without this the training grad differentiates through the CPG
        # jax.grad — wrong weighting gradient AND a second-order conv
        # graph big enough to kill the TPU compile at flagship shapes
        w = jax.lax.stop_gradient(w)
        from nafwebsod_tpu.ops.cpg import csc_constraint
        pos = heads.cls_pred(csc_constraint(out['rois_pred'], w, True))
        neg = heads.cls_pred(csc_constraint(out['rois_pred'], w, False))
        losses['loss_cls_pos'] = loss_ops.cross_entropy_with_logits(
            pos, labels_oh, spec.mean_loss)
        losses['loss_cls_neg'] = loss_ops.cross_entropy_with_logits(
            neg, jnp.zeros_like(labels_oh), spec.mean_loss)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(pos, labels_oh)
    else:
        losses['loss_cls'] = loss_ops.cross_entropy_with_logits(
            cls_prob, labels_oh, spec.mean_loss)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob, labels_oh)

    if spec.mask_on and spec.mask_head == 'deeplab':
        # deeplab branch (wsl_seg_heads.add_deeplab_losses): ASPP head on the
        # conv features, pixel pseudo-labels from CPG saliency, seed +
        # CRF-consistency losses. Needs the no-freeze image gradient like CSC.
        from dataclasses import replace as dc_replace
        from nafwebsod_tpu.models import seg_head
        from nafwebsod_tpu.ops import cpg as cpg_ops

        unfrozen = dc_replace(spec, freeze_conv_body=False, freeze_at=0,
                              csc=False, cpg=False, mask_on=False)
        # opaque to the outer grad (CPG maps are stop-gradient'd below;
        # see the CSC branch for why the params must be sg'd here)
        params_sg = jax.tree.map(jax.lax.stop_gradient, params)

        # train=True with the main tower's rng — same blob-sharing
        # faithfulness argument as the CSC branch above
        def cls_prob_fn(im):
            f7, _, _ = _run_body_and_head(unfrozen, params_sg, im, rois,
                                          obn, train=True, rng=rng,
                                          im_hw=im_hw)
            f7m = f7[0] if spec.is_context else f7
            o = heads.wsl_outputs(params_sg, f7m, valid)
            return heads.cls_pred(o['rois_pred'])

        maps, idx, keep = cpg_ops.cpg_maps(
            cls_prob_fn, image, labels_oh, jax.lax.stop_gradient(cls_prob),
            tau=spec.cpg_tau, max_gt=spec.max_gt_cpg)
        # scatter the selected-class maps into a (1, C-1, H, W) cpg tensor
        cpg_full = jnp.zeros(
            (1, spec.num_classes - 1) + maps.shape[1:], jnp.float32)
        cpg_full = cpg_full.at[0, jnp.maximum(idx, 0)].set(
            jnp.where(keep[:, None, None], maps, 0.0))
        # the head computes at the body's compute dtype (bf16 on TPU) and
        # returns f32 logits — see deeplab_head_forward
        mask_fc8 = seg_head.deeplab_head_forward(
            params, feat, freeze_body=spec.freeze_conv_body, train=True,
            rng=rng)
        sw_active = (batch.get('cur_iter', jnp.zeros(())) < spec.cpg_max_iter
                     if spec.cpg_max_iter > 0 else None)
        # crf_filter_dtype deliberately NOT set: bf16 lattice filtering
        # measured SLOWER on v5e (blur row-gathers 6.2 -> 9.0 ms/step —
        # bf16 tiles pack 2 rows per sublane-pair, so row gathers lose,
        # not win; BASELINE.md negative results)
        dl = seg_head.deeplab_losses(
            mask_fc8, jax.lax.stop_gradient(cpg_full), labels_oh,
            jax.lax.stop_gradient(cls_prob), image, tau=spec.cpg_tau,
            cpg_sw_active=sw_active)
        losses['mask_seed_loss'] = dl['mask_seed_loss']
        losses['mask_constraint_loss'] = dl['mask_constraint_loss']
    elif spec.mask_on:
        from nafwebsod_tpu.models import seg_head
        pooled = _mask_pooled(spec, params, feat, rois)
        mask_logits = _apply_mask_head(spec, params, pooled)
        losses['mask_loss_cls'] = spec.mask_loss_weight * seg_head.mask_losses(
            mask_logits, jax.lax.stop_gradient(out['rois_pred']), rois,
            labels_oh, valid)

    if spec.min_entropy_loss:
        # weight 0.1 (wsl_heads.py:279-290 get_loss_gradients_weighted)
        losses['loss_entropy'] = 0.1 * loss_ops.min_entropy_loss(
            out['rois_pred'], labels_oh, valid)

    if spec.center_loss:
        cf = params['center_feature']
        loss_center, deltas = center_ops.center_loss(
            labels_oh, out['rois_pred'], fc7_main.astype(jnp.float32), cf,
            spec.center_loss_top_k, valid)
        # active only below CSC_MAX_ITER (center_loss_op.cu:77-79);
        # grad weight 0.4096 (wsl_heads.py:274)
        active = batch.get('cur_iter', jnp.zeros(())) < spec.csc_max_iter
        loss_center = jnp.where(active, loss_center, 0.0)
        losses['loss_center'] = 0.4096 * loss_center
        aux['__center_dcf'] = jnp.where(active, 1.0, 0.0) * deltas['center_dcf']
        aux['__center_ndcf'] = (jnp.where(active, 1.0, 0.0) *
                                deltas['center_ndcf'])

    total = sum(losses.values())
    aux.update(losses)
    return total, aux


@partial(jax.jit, static_argnames=('spec', 'tower_fn'))
def forward_train(spec: ModelSpec, params, batch, rng, tower_fn=None):
    """Per-image training forward + losses.

    batch: dict with
      image      (H, W, 3) pixel-mean-subtracted BGR
      rois       (R, 5)
      obn_scores (R,) or (R, 1)
      labels_oh  (1, C-1) image-level labels (possibly mixup-blended)
      valid_mask (R,) bool for padded rois
    Returns (total_loss, aux dict of losses/metrics).
    Matches webly_heads.add_webly_losses / wsl_heads.add_wsl_losses.

    ``tower_fn``: optional fc-tower replacement (``heads._fc_tower``
    signature) threaded to the supported call sites — the tensor-parallel
    step injects its hidden-sharded tower for the end-to-end Faster R-CNN
    branch so every other op in the forward stays this exact code.
    """
    image = batch['image']
    rois = batch['rois']
    obn = batch['obn_scores']
    # image-level labels drive the WSL / RetinaNet paths; the supervised
    # precomputed-proposal blobs carry per-RoI labels_int32 instead
    labels_oh = batch.get('labels_oh')
    valid = batch.get('valid_mask')

    if spec.retinanet:
        # supervised RetinaNet (retinanet_heads.py:447-510): focal +
        # select-smooth-L1 over the pyramid, targets on device
        from nafwebsod_tpu.models import retinanet
        levels, _ = body_forward_fpn(spec, params, image)
        cls_out, bbox_out = retinanet.head_forward(spec, params, levels)
        losses = retinanet.losses(
            spec, cls_out, bbox_out, batch['gt_boxes'],
            batch['gt_classes'].astype(jnp.int32), batch['gt_valid'])
        return sum(losses.values()), dict(losses)

    if spec.retinanet_wsl:
        # WSL RetinaNet (retinanet_heads.py:249-370,513-538): per-level
        # WSDDN-style position maps -> image scores -> CE vs image labels
        from nafwebsod_tpu.models import retinanet_wsl
        levels, _ = body_forward_fpn(spec, params, image)
        _, img_scores = retinanet_wsl.tower_outputs(
            params, levels, spec.retinanet_num_convs)
        losses = {}
        for lvl, score in img_scores.items():
            losses['cls_loss_fpn{}'.format(lvl)] = (
                loss_ops.cross_entropy_with_logits(score, labels_oh,
                                                   spec.mean_loss))
        aux = dict(losses)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(
            sum(img_scores.values()), labels_oh)
        return sum(losses.values()), aux

    if spec.faster_rcnn:
        # end-to-end Faster R-CNN: RPN losses + on-device proposal
        # generation/labeling + box head (model_builder.py:74-112; the
        # reference's GenerateProposals/GenerateProposalLabels python ops
        # run as statically-shaped device code in ops/rpn_device.py)
        from nafwebsod_tpu.models import rpn_head
        from nafwebsod_tpu.ops import rpn_device

        sg = jax.lax.stop_gradient
        if rng is None:
            # rng=None means "deterministic": anchor/proposal sampling runs
            # on a fixed key and dropout is off — the sharded-step parity
            # tests rely on this (dropout masks differ per layout, but the
            # sampled blobs must agree bit-for-bit)
            rng_rpn, rng_prop = jax.random.split(jax.random.PRNGKey(0))
            rng_head = None
        else:
            rng_rpn, rng_prop, rng_head = jax.random.split(rng, 3)
        im_info = batch['im_info']
        if spec.is_fpn:
            levels, scales = body_forward_fpn(spec, params, image)
            rp = _fpn_rpn_forward(spec, params, levels)
            flat_logits, flat_deltas, anchors = (
                rp['logits'], rp['deltas'], rp['anchors'])
        else:
            feat, spatial_scale = body_forward(spec, params, image)
            if spec.freeze_conv_body:
                feat = sg(feat)
            cls_l, bbox_l, probs, deltas, anchors = _rpn_forward(
                spec, params, feat)
            flat_logits, flat_deltas = cls_l.reshape(-1), deltas
        lab, tgt, iw, ow = rpn_device.rpn_targets(
            anchors, batch['gt_boxes'], batch['gt_valid'],
            im_info[0], im_info[1], rng_rpn,
            straddle_thresh=spec.rpn_straddle_thresh,
            positive_overlap=spec.rpn_positive_overlap,
            negative_overlap=spec.rpn_negative_overlap,
            fg_fraction=spec.rpn_fg_fraction,
            batch_size=spec.rpn_batch_size)
        losses = rpn_head.losses_flat(flat_logits, flat_deltas, lab, tgt,
                                      iw, ow)
        if spec.rpn_only:
            return sum(losses.values()), dict(losses)
        if spec.is_fpn:
            props, _, pvalid = _fpn_collect_proposals(
                spec, rp['per_level'], im_info, train=True)
        else:
            props, _, pvalid = rpn_device.generate_proposals(
                sg(probs), sg(deltas), anchors,
                im_info[0], im_info[1], im_info[2],
                pre_nms_top_n=spec.rpn_pre_nms_top_n,
                post_nms_top_n=spec.rpn_post_nms_top_n,
                nms_thresh=spec.rpn_nms_thresh, min_size=spec.rpn_min_size)
        blobs = rpn_device.proposal_labels(
            rng_prop, props, pvalid, batch['gt_boxes'],
            batch['gt_classes'].astype(jnp.int32), batch['gt_valid'],
            rois_per_image=spec.frcnn_batch_size,
            fg_fraction=spec.frcnn_fg_fraction,
            fg_thresh=spec.frcnn_fg_thresh,
            bg_thresh_hi=spec.frcnn_bg_thresh_hi,
            bg_thresh_lo=spec.frcnn_bg_thresh_lo,
            num_classes=spec.num_classes,
            cls_agnostic_bbox_reg=spec.cls_agnostic_bbox_reg,
            bbox_reg_weights=spec.bbox_reg_weights)
        srois = blobs['rois']
        svalid = blobs['valid_mask']
        obn1 = jnp.ones((srois.shape[0], 1), jnp.float32)
        if spec.rfcn:
            logits, bbox_pred = _box_outputs(spec, params, None, feat,
                                             srois, spatial_scale)
        else:
            if spec.is_fpn:
                fc7, _ = _fpn_head_tower(spec, params, levels, scales,
                                         srois, obn1, True, rng_head)
            elif spec.box_head == 'res5_head':
                fc7 = _res5_tower(spec, params, feat, srois, obn1,
                                  spatial_scale)
            elif spec.box_head == 'xconv1fc_gn':
                pooled = heads.roi_transform(
                    feat[0], srois, obn1, spatial_scale,
                    spec.roi_xform_method, spec.roi_resolution,
                    spec.roi_sampling_ratio, spec.freeze_conv_body,
                    flatten=False)
                fc7 = heads.xconv1fc_gn_head(
                    params, pooled, num_convs=spec.num_stacked_convs)
            else:
                fc7, _ = heads.vgg16_roi_2fc_head(
                    params, feat, srois, obn1, spatial_scale,
                    method=spec.roi_xform_method,
                    resolution=spec.roi_resolution,
                    sampling_ratio=spec.roi_sampling_ratio,
                    freeze_body=spec.freeze_conv_body, train=True,
                    rng=rng_head, tower_fn=tower_fn)
            logits, bbox_pred = _fast_rcnn_outputs(spec, params, fc7)
        total, aux = _fast_rcnn_losses(
            spec, logits, bbox_pred, blobs['labels_int32'],
            blobs['bbox_targets'], blobs['bbox_inside_weights'],
            blobs['bbox_outside_weights'], svalid.astype(jnp.float32))
        total = total + losses['loss_rpn_cls'] + losses['loss_rpn_bbox']
        aux.update(losses)
        if spec.mask_on and 'gt_masks' in batch:
            # end-to-end Mask R-CNN: device-resampled gt mask targets on
            # the sampled rois (ops/seg.crop_and_resize_masks — the TPU
            # replacement for per-roi host polygon rasterization)
            from nafwebsod_tpu.models import seg_head
            from nafwebsod_tpu.ops import seg as seg_ops
            fg = (blobs['labels_int32'] > 0) & svalid.astype(bool)
            ga = blobs['gt_assignment']
            m_out = 2 * spec.mask_resolution
            targets = seg_ops.crop_and_resize_masks(
                batch['gt_masks'][ga], batch['gt_boxes'][ga], srois, m_out)
            pooled = _mask_pooled(spec, params,
                                  levels if spec.is_fpn else feat, srois)
            mask_logits = _apply_mask_head(spec, params, pooled)
            loss_mask = spec.mask_loss_weight * seg_ops.e2e_mask_loss(
                mask_logits, sg(targets), blobs['labels_int32'], fg)
            total = total + loss_mask
            aux['loss_mask'] = loss_mask
        if spec.keypoints_on:
            # keypoint head on the fg sampled rois
            # (keypoint_rcnn_heads.py:110-149; targets rasterized on device)
            from nafwebsod_tpu.models import keypoint_head
            kfeat = (levels[spec.fpn_roi_min_level][0] if spec.is_fpn
                     else feat[0])
            kscale = (2.0 ** -spec.fpn_roi_min_level if spec.is_fpn
                      else spatial_scale)
            kp_logits = keypoint_head.forward(
                params, kfeat.astype(jnp.float32), srois, kscale,
                resolution=spec.keypoint_resolution,
                num_convs=spec.keypoint_num_convs)
            hm = 2 * spec.keypoint_resolution
            gt_kps = batch['gt_keypoints'][blobs['gt_assignment']]
            loc, kw = keypoint_head.keypoint_targets_dev(gt_kps, srois, hm)
            fg = ((blobs['labels_int32'] > 0) & svalid.astype(bool))
            kw = kw * jnp.repeat(fg.astype(jnp.float32),
                                 spec.num_keypoints)
            loss_kps = keypoint_head.keypoint_losses(
                kp_logits, loc, kw,
                normalize_by_visible=spec.keypoint_normalize_by_visible,
                loss_weight=spec.keypoint_loss_weight)
            total = total + loss_kps
            aux['loss_kps'] = loss_kps
        return total, aux

    if spec.supervised and spec.rfcn:
        # precomputed-proposal R-FCN: PS score maps straight off the body
        feat, spatial_scale = body_forward(spec, params, image)
        if spec.freeze_conv_body:
            feat = jax.lax.stop_gradient(feat)
        logits, bbox_pred = _box_outputs(spec, params, None, feat, rois,
                                         spatial_scale)
        return _fast_rcnn_losses(
            spec, logits, bbox_pred, batch['labels_int32'],
            batch['bbox_targets'], batch['bbox_inside_weights'],
            batch['bbox_outside_weights'], valid)

    im_hw = batch.get('im_hw')  # true (h, w) inside the padded canvas
    fc7_clean, fc7_noisy, feat = _run_body_and_head(
        spec, params, image, rois, obn, train=True, rng=rng, im_hw=im_hw)
    if spec.supervised:
        # Fast R-CNN supervised losses on precomputed-proposal blobs
        total, aux = fast_rcnn_tail_losses(spec, params, batch, fc7_clean)
        if spec.mask_on and 'mask_rois' in batch:
            # supervised Mask R-CNN loss on loader-sampled fg rois
            # (mask_rcnn_heads.add_mask_rcnn_losses; padded rows carry -1
            # ignore targets)
            from nafwebsod_tpu.data.mask_rcnn import mask_rcnn_loss
            from nafwebsod_tpu.models import seg_head
            pooled = _mask_pooled(spec, params, feat, batch['mask_rois'])
            mask_logits = _apply_mask_head(spec, params, pooled)
            targets = batch['masks_int32']
            if spec.mask_cls_specific:
                # the loader expands to num_classes slots; the head emits
                # C-1 foreground channels — drop the always-ignored bg slot
                m2 = targets.shape[1] // spec.num_classes
                targets = targets[:, m2:]
            loss_mask = mask_rcnn_loss(mask_logits, targets,
                                       loss_weight=spec.mask_loss_weight)
            total = total + loss_mask
            aux['loss_mask'] = loss_mask
        return total, aux
    return wsl_tail_losses(spec, params, batch, fc7_clean, fc7_noisy,
                           feat, rng)
