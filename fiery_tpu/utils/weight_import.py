"""Torch-checkpoint weight importer: reference FIERY state_dict -> fiery_tpu variables.

Maps the reference PyTorch parameter names (TrainingModule / Fiery module tree,
/root/reference/fiery/trainer.py + models/*) onto this repo's flax tree, with layout
transposes (Conv2d OIHW -> HWIO, Conv3d OIDHW -> DHWIO) and BatchNorm renames
(weight/bias/running_mean/running_var -> scale/bias/mean/var). Intended for golden
activation/metric parity against released reference checkpoints, and for importing
ImageNet EfficientNet weights.

The mapping is generated programmatically from the model config so it stays in sync
with the reference architecture (block counts, GRU blocks, head presence). It is
validated structurally in tests by round-tripping a synthetically-named state dict.
"""

from typing import Dict, List, Tuple

import numpy as np

from fiery_tpu.models.efficientnet import block_specs, truncation_index


def _conv2d(t):   # torch OIHW -> flax HWIO
    return np.transpose(t, (2, 3, 1, 0))


def _conv3d_causal(t):
    """torch Conv3d (O, C, kt, kh, kw) -> our causal-stacked 2D kernel
    (kh, kw, kt*C, O) (see models/temporal_layers.CausalConv3d)."""
    kh, kw = t.shape[3], t.shape[4]
    out = np.transpose(t, (3, 4, 2, 1, 0))          # (kh, kw, kt, C, O)
    return out.reshape(kh, kw, -1, out.shape[-1])


def _conv3d_causal_kt2(t):
    return _conv3d_causal(t)


def _conv3d_causal_kt1(t):
    return _conv3d_causal(t)


def _conv3d_1x1(t):
    """torch 1x1x1 Conv3d (O, C, 1, 1, 1) -> 2D 1x1 kernel (1, 1, C, O)."""
    return np.transpose(t[:, :, 0], (2, 3, 1, 0))


def _id(t):
    return np.asarray(t)


def _concat_conv2d(ts):
    """Several torch OIHW kernels -> one HWIO kernel, output channels concatenated
    (for branches fused into a single conv; see SpatialGRU gates / FusedHeads)."""
    return np.concatenate([_conv2d(t) for t in ts], axis=-1)


def _concat_conv3d_1x1(ts):
    return np.concatenate([_conv3d_1x1(t) for t in ts], axis=-1)


def _concat_id(ts):
    return np.concatenate([np.asarray(t) for t in ts], axis=0)


# entries: (flax_path, torch_name, transform, collection) where collection is
# 'params' or 'batch_stats'. torch_name may be a TUPLE of names for fused
# parameters; the transform then receives the tuple of tensors.
Entry = Tuple[Tuple[str, ...], object, object, str]


def _bn(flax_prefix, torch_prefix) -> List[Entry]:
    """Our BatchNorm wrapper nests an inner nn.BatchNorm called BatchNorm_0."""
    inner = flax_prefix + ('BatchNorm_0',)
    return [
        (inner + ('scale',), torch_prefix + '.weight', _id, 'params'),
        (inner + ('bias',), torch_prefix + '.bias', _id, 'params'),
        (inner + ('mean',), torch_prefix + '.running_mean', _id, 'batch_stats'),
        (inner + ('var',), torch_prefix + '.running_var', _id, 'batch_stats'),
    ]


def _bn_fused(flax_prefix, torch_prefixes) -> List[Entry]:
    """One fused BatchNorm fed by several reference BNs (channel-concatenated)."""
    inner = flax_prefix + ('BatchNorm_0',)
    return [
        (inner + ('scale',), tuple(t + '.weight' for t in torch_prefixes),
         _concat_id, 'params'),
        (inner + ('bias',), tuple(t + '.bias' for t in torch_prefixes),
         _concat_id, 'params'),
        (inner + ('mean',), tuple(t + '.running_mean' for t in torch_prefixes),
         _concat_id, 'batch_stats'),
        (inner + ('var',), tuple(t + '.running_var' for t in torch_prefixes),
         _concat_id, 'batch_stats'),
    ]


def _conv(flax_path, torch_name, bias=False, transform=None) -> List[Entry]:
    tr = transform or _conv2d
    out = [(flax_path + ('kernel',), torch_name + '.weight', tr, 'params')]
    if bias:
        out.append((flax_path + ('bias',), torch_name + '.bias', _id, 'params'))
    return out


def _conv1x1x1_norm_act(flax_prefix, torch_prefix) -> List[Entry]:
    """Conv1x1x1NormActivated: Conv_0 + BatchNorm_0 <-> Sequential(conv, norm)."""
    return (_conv(flax_prefix + ('Conv_0',), torch_prefix + '.conv',
                  transform=_conv3d_1x1)
            + _bn(flax_prefix + ('BatchNorm_0',), torch_prefix + '.norm'))


def _causal_conv3d(flax_prefix, torch_prefix, kt=2) -> List[Entry]:
    tr = _conv3d_causal_kt2 if kt == 2 else _conv3d_causal_kt1
    return (_conv(flax_prefix + ('Conv_0',), torch_prefix + '.conv', transform=tr)
            + _bn(flax_prefix + ('BatchNorm_0',), torch_prefix + '.norm'))


def _bottleneck2d(flax_prefix, torch_prefix, has_projection) -> List[Entry]:
    """layers.py Bottleneck <-> reference convolutions.Bottleneck (convolutions.py:64-168).

    flax naming in Bottleneck.__call__: Conv_0 (down), BatchNorm_0, Conv_1 (mid),
    BatchNorm_1, Conv_2 (up), BatchNorm_2, then Conv_3 + BatchNorm_3 for the skip proj.
    """
    p = flax_prefix
    t = torch_prefix
    out = (_conv(p + ('Conv_0',), t + '.layers.conv_down_project')
           + _bn(p + ('BatchNorm_0',), t + '.layers.abn_down_project.0')
           + _conv(p + ('Conv_1',), t + '.layers.conv')
           + _bn(p + ('BatchNorm_1',), t + '.layers.abn.0')
           + _conv(p + ('Conv_2',), t + '.layers.conv_up_project')
           + _bn(p + ('BatchNorm_2',), t + '.layers.abn_up_project.0'))
    if has_projection:
        out += (_conv(p + ('Conv_3',), t + '.projection.conv_skip_proj')
                + _bn(p + ('BatchNorm_3',), t + '.projection.bn_skip_proj'))
    return out


def _conv_block(flax_prefix, torch_prefix) -> List[Entry]:
    """layers.py ConvBlock (conv + BN) <-> reference ConvBlock (.conv / .norm)."""
    return (_conv(flax_prefix + ('Conv_0',), torch_prefix + '.conv')
            + _bn(flax_prefix + ('BatchNorm_0',), torch_prefix + '.norm'))


def encoder_mapping(version='b4', downsample=8) -> List[Entry]:
    """bev_lift/encoder <-> model.encoder.* (reference encoder.py, efficientnet_pytorch)."""
    entries: List[Entry] = []
    base = ('bev_lift', 'encoder')
    fpn = base + ('EfficientNetFPN_0',)
    tb = 'model.encoder.backbone'
    # stem
    entries += _conv(fpn + ('Conv_0',), tb + '._conv_stem')
    entries += _bn(fpn + ('BatchNorm_0',), tb + '._bn0')

    specs = block_specs(version)
    n_blocks = truncation_index(version, downsample) + 1
    for i in range(n_blocks):
        _, _, expand, _, _, se = specs[i]
        fb = fpn + (f'MBConvBlock_{i}',)
        tblk = f'{tb}._blocks.{i}'
        ci = 0  # flax Conv counter inside the block
        bi = 0  # flax BatchNorm counter
        if expand != 1:
            entries += _conv(fb + (f'Conv_{ci}',), tblk + '._expand_conv')
            entries += _bn(fb + (f'BatchNorm_{bi}',), tblk + '._bn0')
            ci += 1
            bi += 1
        entries += _conv(fb + (f'Conv_{ci}',), tblk + '._depthwise_conv')
        entries += _bn(fb + (f'BatchNorm_{bi}',), tblk + '._bn1')
        ci += 1
        bi += 1
        if se:
            entries += _conv(fb + (f'Conv_{ci}',), tblk + '._se_reduce', bias=True)
            entries += _conv(fb + (f'Conv_{ci + 1}',), tblk + '._se_expand', bias=True)
            ci += 2
        entries += _conv(fb + (f'Conv_{ci}',), tblk + '._project_conv')
        entries += _bn(fb + (f'BatchNorm_{bi}',), tblk + '._bn2')

    # UpsamplingConcat: Conv_0/BN_0/Conv_1/BN_1 <-> conv.{0,1,3,4}
    up = base + ('UpsamplingConcat_0',)
    tu = 'model.encoder.upsampling_layer'
    entries += _conv(up + ('Conv_0',), tu + '.conv.0')
    entries += _bn(up + ('BatchNorm_0',), tu + '.conv.1')
    entries += _conv(up + ('Conv_1',), tu + '.conv.3')
    entries += _bn(up + ('BatchNorm_1',), tu + '.conv.4')

    entries += _conv(base + ('depth_layer',), 'model.encoder.depth_layer', bias=True)
    return entries


def temporal_mapping(receptive_field=3, use_pyramid_pooling=True,
                     in_channels=70, start_out_channels=64) -> List[Entry]:
    """temporal_model <-> model.temporal_model.model.{i} (TemporalBlock stack)."""
    entries: List[Entry] = []
    block_in = in_channels
    block_out = start_out_channels
    for i in range(receptive_field - 1):
        fb = ('temporal_model', f'TemporalBlock_{i}')
        t = f'model.temporal_model.model.{i}'
        # paths: [1x1x1 -> causal(2,3,3)], [1x1x1 -> causal(1,3,3)], [1x1x1].
        # The three parallel 1x1x1 prologs are fused into one conv+BN in
        # TemporalBlock (models/temporal_layers.py 'prolog_fused'):
        prolog_convs = [f'{t}.convolution_paths.0.0.conv',
                        f'{t}.convolution_paths.1.0.conv',
                        f'{t}.convolution_paths.2.conv']
        prolog_bns = [f'{t}.convolution_paths.0.0.norm',
                      f'{t}.convolution_paths.1.0.norm',
                      f'{t}.convolution_paths.2.norm']
        pf = fb + ('prolog_fused',)
        entries += [(pf + ('Conv_0', 'kernel'),
                     tuple(c + '.weight' for c in prolog_convs),
                     _concat_conv3d_1x1, 'params')]
        entries += _bn_fused(pf + ('BatchNorm_0',), prolog_bns)
        for pi, kt in enumerate([2, 1]):
            entries += _causal_conv3d(fb + (f'CausalConv3d_{pi}',),
                                      f'{t}.convolution_paths.{pi}.1', kt=kt)
        if use_pyramid_pooling:
            entries += _conv1x1x1_norm_act(
                fb + ('PyramidSpatioTemporalPooling_0', 'Conv1x1x1NormActivated_0'),
                f'{t}.pyramid_pooling.features.0.conv_bn_relu')
        entries += _conv1x1x1_norm_act(fb + ('Conv1x1x1NormActivated_0',),
                                       f'{t}.aggregation.0')
        if block_out != block_in:
            entries += _conv(fb + ('Conv_0',), f'{t}.projection.0',
                             transform=_conv3d_1x1)
            entries += _bn(fb + ('BatchNorm_0',), f'{t}.projection.1')
        block_in = block_out
    return entries


def distribution_mapping(which: str) -> List[Entry]:
    """present/future distribution <-> model.{which}_distribution."""
    entries: List[Entry] = []
    fb = (f'{which}_distribution',)
    t = f'model.{which}_distribution'
    for i in range(4):
        # downsampling bottlenecks always have a projection (downsample=True)
        entries += _bottleneck2d(fb + ('DistributionEncoder_0', f'Bottleneck_{i}'),
                                 f'{t}.encoder.model.{i}', has_projection=True)
    entries += _conv(fb + ('Conv_0',), f'{t}.last_conv.1', bias=True)
    return entries


def future_prediction_mapping(n_gru_blocks=3, n_res_layers=3) -> List[Entry]:
    entries: List[Entry] = []
    for i in range(n_gru_blocks):
        fg = ('future_prediction', f'SpatialGRU_{i}')
        t = f'model.future_prediction.spatial_grus.{i}'
        # update/reset gate convs are fused into one 'conv_gates' conv
        # (models/temporal_layers.SpatialGRU; update channels first, then reset)
        entries += [
            (fg + ('conv_gates', 'kernel'),
             (t + '.conv_update.weight', t + '.conv_reset.weight'),
             _concat_conv2d, 'params'),
            (fg + ('conv_gates', 'bias'),
             (t + '.conv_update.bias', t + '.conv_reset.bias'),
             _concat_id, 'params'),
        ]
        entries += _conv_block(fg + ('conv_state_tilde',), t + '.conv_state_tilde')
        for j in range(n_res_layers):
            # res Bottlenecks keep channel count -> no projection
            entries += _bottleneck2d(
                ('future_prediction', f'Bottleneck_{i * n_res_layers + j}'),
                f'model.future_prediction.res_blocks.{i}.{j}', has_projection=False)
    return entries


def decoder_mapping(predict_future_flow=True) -> List[Entry]:
    entries: List[Entry] = []
    fb = ('decoder',)
    t = 'model.decoder'
    entries += _conv(fb + ('Conv_0',), t + '.first_conv')
    entries += _bn(fb + ('BatchNorm_0',), t + '.bn1')
    # layers 1-3 (BasicBlock_0..5); strided first blocks of layer2/3 have downsample
    layer_specs = [('layer1', 0, False), ('layer1', 1, False),
                   ('layer2', 0, True), ('layer2', 1, False),
                   ('layer3', 0, True), ('layer3', 1, False)]
    for bi, (layer, j, has_down) in enumerate(layer_specs):
        fblk = fb + (f'BasicBlock_{bi}',)
        tblk = f'{t}.{layer}.{j}'
        entries += _conv(fblk + ('Conv_0',), tblk + '.conv1')
        entries += _bn(fblk + ('BatchNorm_0',), tblk + '.bn1')
        entries += _conv(fblk + ('Conv_1',), tblk + '.conv2')
        entries += _bn(fblk + ('BatchNorm_1',), tblk + '.bn2')
        if has_down:
            entries += _conv(fblk + ('Conv_2',), tblk + '.downsample.0')
            entries += _bn(fblk + ('BatchNorm_2',), tblk + '.downsample.1')
    for i, name in enumerate(['up3_skip', 'up2_skip', 'up1_skip']):
        fu = fb + (f'UpsamplingAdd_{i}',)
        entries += _conv(fu + ('Conv_0',), f'{t}.{name}.upsample_layer.1')
        entries += _bn(fu + ('BatchNorm_0',), f'{t}.{name}.upsample_layer.2')
    # the four heads' 3x3 convs + BNs are fused into decoder/heads
    # (models/decoder.FusedHeads); the trailing 1x1s stay per-head (out_i)
    head_names = ['segmentation_head', 'instance_center_head', 'instance_offset_head']
    if predict_future_flow:
        head_names.append('instance_future_head')
    hf = fb + ('heads',)
    entries += [(hf + ('conv_fused', 'kernel'),
                 tuple(f'{t}.{th}.0.weight' for th in head_names),
                 _concat_conv2d, 'params')]
    entries += _bn_fused(hf + ('BatchNorm_0',),
                         [f'{t}.{th}.1' for th in head_names])
    for i, th in enumerate(head_names):
        entries += _conv(hf + (f'out_{i}',), f'{t}.{th}.3', bias=True)
    return entries


def build_mapping(model_cfg) -> List[Entry]:
    """Full mapping for a FieryConfig."""
    entries = encoder_mapping(model_cfg.encoder_name.split('-')[1],
                              model_cfg.encoder_downsample)
    if model_cfg.temporal_name == 'temporal_block':
        in_ch = model_cfg.encoder_out_channels + (6 if model_cfg.input_egopose else 0)
        entries += temporal_mapping(model_cfg.receptive_field,
                                    model_cfg.pyramid_pooling,
                                    in_ch, model_cfg.start_out_channels)
    if model_cfg.n_future > 0:
        if model_cfg.probabilistic_enabled:
            entries += distribution_mapping('present')
            entries += distribution_mapping('future')
        entries += future_prediction_mapping(model_cfg.n_gru_blocks,
                                             model_cfg.n_res_layers)
    entries += decoder_mapping(model_cfg.instance_flow_enabled)
    return entries


def _set_in(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _get_in(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node


def import_torch_state_dict(state_dict: Dict[str, np.ndarray], model_cfg,
                            variables=None, strict=True):
    """Convert a reference torch state_dict into {'params': ..., 'batch_stats': ...}.

    state_dict values may be numpy arrays or anything np.asarray accepts. If
    ``variables`` (an existing flax variables dict) is given, shapes are checked
    against it. Unmatched torch keys raise when strict (num_batches_tracked and the
    uncertainty weights are always ignored; the latter are returned separately).
    """
    mapping = build_mapping(model_cfg)
    out = {'params': {}, 'batch_stats': {}}
    used = set()
    for flax_path, torch_name, transform, collection in mapping:
        names = torch_name if isinstance(torch_name, tuple) else (torch_name,)
        missing = [n for n in names if n not in state_dict]
        if missing:
            if strict:
                raise KeyError(f'torch checkpoint missing {missing[0]}')
            continue
        if isinstance(torch_name, tuple):
            value = transform(tuple(np.asarray(state_dict[n]) for n in names))
        else:
            value = transform(np.asarray(state_dict[torch_name]))
        if variables is not None:
            expected = np.asarray(_get_in(variables[collection], flax_path))
            if expected.shape != value.shape:
                raise ValueError(
                    f'{torch_name} -> {"/".join(flax_path)}: shape {value.shape} '
                    f'!= expected {expected.shape}')
        _set_in(out[collection], flax_path, value)
        used.update(names)

    uncertainty = {}
    for uw in ['segmentation_weight', 'centerness_weight', 'offset_weight',
               'flow_weight']:
        key = f'model.{uw}'
        if key in state_dict:
            uncertainty[uw] = np.asarray(state_dict[key])
            used.add(key)

    leftover = [k for k in state_dict
                if k not in used and not k.endswith('num_batches_tracked')
                and not k.startswith(('model.frustum', 'model.bev_'))]
    if strict and leftover:
        raise KeyError(f'unmapped torch keys ({len(leftover)}): {leftover[:10]} ...')
    return out, uncertainty


def import_efficientnet_state_dict(state_dict: Dict[str, np.ndarray], model_cfg,
                                   variables=None):
    """Convert a STANDALONE ImageNet EfficientNet state dict (efficientnet_pytorch
    naming without any prefix: ``_conv_stem.weight``, ``_blocks.N._depthwise_conv
    .weight``, ...) into the encoder-backbone subtree of the full variables pytree.

    This is the TPU equivalent of the reference's default ImageNet initialisation
    (``EfficientNet.from_pretrained``, /root/reference/fiery/models/encoder.py:16).
    Keys beyond the truncation point (``_conv_head``, ``_bn1``, ``_fc``, blocks past
    the stride-8 cut) are ignored, mirroring ``delete_unused_layers``
    (encoder.py:40-56). Returns ({'params': ..., 'batch_stats': ...}) containing
    only backbone entries.
    """
    prefixed = {'model.encoder.backbone.' + k: v for k, v in state_dict.items()}
    version = model_cfg.encoder_name.split('-')[1]
    entries = [e for e in encoder_mapping(version, model_cfg.encoder_downsample)
               if e[1].startswith('model.encoder.backbone.')]
    out = {'params': {}, 'batch_stats': {}}
    for flax_path, torch_name, transform, collection in entries:
        if torch_name not in prefixed:
            raise KeyError(
                f'EfficientNet state dict missing {torch_name.split("backbone.")[1]}')
        value = transform(np.asarray(prefixed[torch_name]))
        if variables is not None:
            expected = np.asarray(_get_in(variables[collection], flax_path))
            if expected.shape != value.shape:
                raise ValueError(
                    f'{torch_name} -> {"/".join(flax_path)}: shape {value.shape} '
                    f'!= expected {expected.shape}')
        _set_in(out[collection], flax_path, value)
    return out


def merge_subtree(dst, src):
    """Recursively overwrite leaves of ``dst`` present in ``src`` (shape-checked)."""
    out = {}
    for k, v in dst.items():
        if k in src and isinstance(v, dict):
            out[k] = merge_subtree(v, src[k])
        elif k in src:
            value = src[k]
            if getattr(value, 'shape', None) != getattr(v, 'shape', None):
                raise ValueError(f'{k}: shape {getattr(value, "shape", None)} != '
                                 f'{getattr(v, "shape", None)}')
            out[k] = np.asarray(value).astype(np.asarray(v).dtype)
        else:
            out[k] = v
    return out


def export_expected_torch_names(model_cfg):
    """The torch names this importer expects (for tests / coverage checks)."""
    names = []
    for _, torch_name, _, _ in build_mapping(model_cfg):
        if isinstance(torch_name, tuple):
            names.extend(torch_name)
        else:
            names.append(torch_name)
    return names
