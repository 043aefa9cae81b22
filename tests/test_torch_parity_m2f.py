"""Full-model torch->flax conversion parity for Mask2Former VIS.

A pure-torch replica of the reference stack — ResNet-50 backbone +
mmdet MSDeformAttnPixelDecoder + the mmtrack Mask2FormerHead forward
(/root/reference/mmtrack/models/track_heads/mask2former_head.py:477-560,
layers/positional_encoding.py:61-117 SinePositionalEncoding3D) — is built
with mmdet/mmcv state-dict naming, randomized, converted through
``convert_mask2former_state_dict``, and asserted forward-equal to
``models.vis.mask2former.Mask2FormerVIS`` per decoder layer.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stereotracking_tpu.models.vis.mask2former import (  # noqa: E402
    Mask2FormerConfig, Mask2FormerVIS, sine_positional_encoding_3d)
from stereotracking_tpu.utils import torch_convert as TC  # noqa: E402

from test_torch_parity_zoo import TResNet50, _randomize  # noqa: E402

DIM, HEADS, Q, K, T = 32, 4, 10, 5, 2
ENC_LAYERS, DEC_LAYERS = 2, 3


def t_sine2d(h, w, num_feats, eps=1e-6):
    """mmdet SinePositionalEncoding(normalize=True), all-valid mask."""
    y = torch.arange(1, h + 1, dtype=torch.float32) / (h + eps) * 2 * math.pi
    x = torch.arange(1, w + 1, dtype=torch.float32) / (w + eps) * 2 * math.pi

    def enc(v, nf):
        dim_t = 10000.0 ** (2 * (torch.arange(nf) // 2) / nf)
        p = v[:, None] / dim_t
        return torch.stack([p[:, 0::2].sin(), p[:, 1::2].cos()],
                           2).reshape(v.shape[0], -1)

    py = enc(y, num_feats)[:, None, :].expand(h, w, num_feats)
    px = enc(x, num_feats)[None, :, :].expand(h, w, num_feats)
    return torch.cat([py, px], -1)                     # (H, W, 2nf)


def t_sine3d(t, h, w, num_feats, eps=1e-6):
    """SinePositionalEncoding3D (positional_encoding.py:61-117)."""
    z = torch.arange(1, t + 1, dtype=torch.float32) / (t + eps) * 2 * math.pi

    def enc(v, nf):
        dim_t = 10000.0 ** (2 * (torch.arange(nf) // 2) / nf)
        p = v[:, None] / dim_t
        return torch.stack([p[:, 0::2].sin(), p[:, 1::2].cos()],
                           2).reshape(v.shape[0], -1)

    pos2d = t_sine2d(h, w, num_feats, eps)             # (H, W, 2nf)
    pz = enc(z, num_feats * 2)                         # (T, 2nf)
    return pos2d[None] + pz[:, None, None, :]          # (T, H, W, 2nf)


class TConvGN(torch.nn.Module):
    """mmdet ConvModule(conv + GN, no act) key naming (.conv / .gn)."""

    def __init__(self, cin, cout, k, bias=True, groups=32):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, padding=k // 2, bias=bias)
        self.gn = torch.nn.GroupNorm(groups, cout)

    def forward(self, x):
        return self.gn(self.conv(x))


class TMSDA(torch.nn.Module):
    """mmcv MultiScaleDeformableAttention parameter naming."""

    def __init__(self, dim, heads, levels, points):
        super().__init__()
        self.heads, self.levels, self.points = heads, levels, points
        self.sampling_offsets = torch.nn.Linear(dim,
                                                heads * levels * points * 2)
        self.attention_weights = torch.nn.Linear(dim,
                                                 heads * levels * points)
        self.value_proj = torch.nn.Linear(dim, dim)
        self.output_proj = torch.nn.Linear(dim, dim)

    def forward(self, query, value, ref_pts, shapes):
        """query already carries pos; standard grid_sample evaluation."""
        n, L, dim = query.shape
        h, lv, p = self.heads, self.levels, self.points
        hd = dim // h
        tv = self.value_proj(value)
        off = self.sampling_offsets(query).reshape(n, L, h, lv, p, 2)
        aw = torch.softmax(
            self.attention_weights(query).reshape(n, L, h, lv * p), -1
        ).reshape(n, L, h, lv, p)
        starts = np.concatenate(
            [[0], np.cumsum([hh * ww for hh, ww in shapes])])
        acc = torch.zeros(n, L, h, hd)
        for li, (hh, ww) in enumerate(shapes):
            vm = tv[:, starts[li]:starts[li + 1]].reshape(n, hh, ww, h, hd)
            vm = vm.permute(0, 3, 4, 1, 2).reshape(n * h, hd, hh, ww)
            loc = ref_pts[None, :, None, None, :] + \
                off[:, :, :, li] / torch.tensor([ww, hh],
                                                dtype=torch.float32)
            grid = (loc * 2 - 1).permute(0, 2, 1, 3, 4) \
                                .reshape(n * h, L, p, 2)
            samp = torch.nn.functional.grid_sample(
                vm, grid, mode='bilinear', padding_mode='zeros',
                align_corners=False)
            samp = samp.reshape(n, h, hd, L, p).permute(0, 3, 1, 4, 2)
            acc = acc + (samp * aw[:, :, :, li, :, None]).sum(3)
        return self.output_proj(acc.reshape(n, L, dim))


class TMMFFN(torch.nn.Module):
    """mmcv FFN naming: layers.0.0 -> ReLU -> layers.1."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = torch.nn.Sequential(
            torch.nn.Sequential(torch.nn.Linear(dim, hidden),
                                torch.nn.ReLU()),
            torch.nn.Linear(hidden, dim))

    def forward(self, x):
        return self.layers(x)


class TEncLayer(torch.nn.Module):
    def __init__(self, dim, heads, levels, points, ffn):
        super().__init__()
        self.attentions = torch.nn.ModuleList(
            [TMSDA(dim, heads, levels, points)])
        self.ffns = torch.nn.ModuleList([TMMFFN(dim, ffn)])
        self.norms = torch.nn.ModuleList(
            [torch.nn.LayerNorm(dim) for _ in range(2)])

    def forward(self, x, pos, ref, shapes):
        a = self.attentions[0](x + pos, x, ref, shapes)
        x = self.norms[0](x + a)
        return self.norms[1](x + self.ffns[0](x))


class TPixelDecoder(torch.nn.Module):
    """mmdet MSDeformAttnPixelDecoder key naming + forward."""

    def __init__(self, in_channels, dim, num_layers, ffn=1024):
        super().__init__()
        # encoder levels: strides 32, 16, 8 (low->high res)
        self.input_convs = torch.nn.ModuleList(
            [TConvGN(c, dim, 1, bias=True) for c in in_channels[::-1][:3]])
        enc = torch.nn.Module()
        enc.layers = torch.nn.ModuleList(
            [TEncLayer(dim, 8, 3, 4, ffn)   # pixel-decoder heads = 8
             for _ in range(num_layers)])
        self.encoder = enc
        self.level_encoding = torch.nn.Embedding(3, dim)
        self.lateral_convs = torch.nn.ModuleList(
            [TConvGN(in_channels[0], dim, 1, bias=False)])
        self.output_convs = torch.nn.ModuleList(
            [TConvGN(dim, dim, 3, bias=False)])
        self.mask_feature = torch.nn.Conv2d(dim, dim, 1)

    def forward(self, feats):
        # feats: NCHW stride 4, 8, 16, 32
        enc_feats = [feats[3], feats[2], feats[1]]
        dim = self.mask_feature.in_channels
        tokens, poss, shapes, refs = [], [], [], []
        for i, f in enumerate(enc_feats):
            x = self.input_convs[i](f)
            n, _, hh, ww = x.shape
            pos = t_sine2d(hh, ww, dim // 2).reshape(1, hh * ww, dim)
            tokens.append(x.flatten(2).transpose(1, 2))
            poss.append(pos + self.level_encoding.weight[i])
            shapes.append((hh, ww))
            ys, xs = np.meshgrid((np.arange(hh) + 0.5) / hh,
                                 (np.arange(ww) + 0.5) / ww, indexing='ij')
            refs.append(np.stack([xs.ravel(), ys.ravel()], -1))
        x = torch.cat(tokens, 1)
        pos = torch.cat(poss, 1)
        ref = torch.from_numpy(
            np.concatenate(refs, 0).astype(np.float32))
        for lay in self.encoder.layers:
            x = lay(x, pos, ref, shapes)
        starts = np.concatenate(
            [[0], np.cumsum([hh * ww for hh, ww in shapes])])
        memories = [
            x[:, starts[i]:starts[i + 1]].transpose(1, 2).reshape(
                -1, dim, shapes[i][0], shapes[i][1]) for i in range(3)]
        lat = self.lateral_convs[0](feats[0])
        up = torch.nn.functional.interpolate(
            memories[2], size=lat.shape[-2:], mode='bilinear',
            align_corners=False)
        y = torch.relu(self.output_convs[0](lat + up))
        return self.mask_feature(y), memories


class TMMAttention(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(dim, heads,
                                                batch_first=True)


class TM2FDecLayer(torch.nn.Module):
    """mmcv BaseTransformerLayer, operation order cross->self->ffn
    (attentions.0 = cross attention; mask2former_head.py:543-556)."""

    def __init__(self, dim, heads, ffn):
        super().__init__()
        self.attentions = torch.nn.ModuleList(
            [TMMAttention(dim, heads) for _ in range(2)])
        self.ffns = torch.nn.ModuleList([TMMFFN(dim, ffn)])
        self.norms = torch.nn.ModuleList(
            [torch.nn.LayerNorm(dim) for _ in range(3)])

    def forward(self, tgt, qpos, mem, mpos, attn_mask):
        a, _ = self.attentions[0].attn(tgt + qpos, mem + mpos, mem,
                                       attn_mask=attn_mask)
        tgt = self.norms[0](tgt + a)
        a, _ = self.attentions[1].attn(tgt + qpos, tgt + qpos, tgt)
        tgt = self.norms[1](tgt + a)
        return self.norms[2](tgt + self.ffns[0](tgt))


class THead(torch.nn.Module):
    def __init__(self, in_channels, dim, heads, q, k, enc_layers,
                 dec_layers, ffn):
        super().__init__()
        self.heads = heads
        self.pixel_decoder = TPixelDecoder(in_channels, dim, enc_layers)
        dec = torch.nn.Module()
        dec.layers = torch.nn.ModuleList(
            [TM2FDecLayer(dim, heads, ffn) for _ in range(dec_layers)])
        dec.post_norm = torch.nn.LayerNorm(dim)
        self.transformer_decoder = dec
        self.query_embed = torch.nn.Embedding(q, dim)
        self.query_feat = torch.nn.Embedding(q, dim)
        self.level_embed = torch.nn.Embedding(3, dim)
        self.cls_embed = torch.nn.Linear(dim, k + 1)
        self.mask_embed = torch.nn.Sequential(
            torch.nn.Linear(dim, dim), torch.nn.ReLU(),
            torch.nn.Linear(dim, dim), torch.nn.ReLU(),
            torch.nn.Linear(dim, dim))

    def _forward_head(self, query, mask_features, target_hw):
        """mask2former_head.py:425-475 (batch = 1)."""
        out = self.transformer_decoder.post_norm(query)
        cls_pred = self.cls_embed(out)
        me = self.mask_embed(out)
        mask_pred = torch.einsum('qc,tchw->qthw', me, mask_features)
        q, t = mask_pred.shape[:2]
        am = torch.nn.functional.interpolate(
            mask_pred, size=target_hw, mode='bilinear',
            align_corners=False)
        am = (am.sigmoid() < 0.5).reshape(q, -1)        # True = BLOCK
        am = am.detach()
        return cls_pred, mask_pred, am

    def forward(self, feats, t):
        dim = self.cls_embed.in_features
        mask_features, memories = self.pixel_decoder(feats)
        mask_features = mask_features.reshape(
            t, dim, *mask_features.shape[-2:])

        mem_seqs, mem_pos = [], []
        for i, m in enumerate(memories):
            # decoder_input_projs are Identity (head:122-131)
            x = m.flatten(2) + self.level_embed.weight[i][None, :, None]
            bt, _, hw = x.shape
            x = x.reshape(1, t, dim, hw).permute(0, 1, 3, 2) \
                 .reshape(1, t * hw, dim)
            hh, ww = m.shape[-2:]
            pos = t_sine3d(t, hh, ww, dim // 2).reshape(1, t * hh * ww, dim)
            mem_seqs.append(x)
            mem_pos.append(pos)

        query = self.query_feat.weight[None]
        qpos = self.query_embed.weight[None]

        cls_list, mask_list = [], []
        cls_pred, mask_pred, am = self._forward_head(
            query[0], mask_features, memories[0].shape[-2:])
        cls_list.append(cls_pred)
        mask_list.append(mask_pred)
        for i, lay in enumerate(self.transformer_decoder.layers):
            lvl = i % 3
            # all-background -> attend everywhere (head:543-547)
            am[am.sum(-1) == am.shape[-1]] = False
            mask = am[None].expand(self.heads, -1, -1)
            query = lay(query, qpos, mem_seqs[lvl], mem_pos[lvl], mask)
            nxt = (i + 1) % 3
            cls_pred, mask_pred, am = self._forward_head(
                query[0], mask_features, memories[nxt].shape[-2:])
            cls_list.append(cls_pred)
            mask_list.append(mask_pred)
        return cls_list, mask_list


class TMask2Former(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TResNet50()
        self.track_head = THead((256, 512, 1024, 2048), DIM, HEADS, Q, K,
                                ENC_LAYERS, DEC_LAYERS, ffn=64)

    def forward(self, imgs):
        return self.track_head(self.backbone(imgs), imgs.shape[0])


def test_sine3d_matches_reference_transcription():
    """Flax 3D encoding == the torch transcription of the reference file."""
    ours = sine_positional_encoding_3d(3, 5, 7, 8)
    ref = t_sine3d(3, 5, 7, 8)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_mask2former_full_model_parity():
    tm = _randomize(TMask2Former(), seed=7)
    rng = np.random.RandomState(0)
    imgs = rng.rand(T, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        t_cls, t_mask = tm(torch.from_numpy(
            imgs.transpose(0, 3, 1, 2)))

    params, stats = TC.convert_mask2former_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, heads=HEADS)
    cfg = Mask2FormerConfig(num_classes=K, num_queries=Q, embed_dim=DIM,
                            num_heads=HEADS, num_decoder_layers=DEC_LAYERS,
                            ffn_dim=64, pixel_decoder_layers=ENC_LAYERS)
    model = Mask2FormerVIS(cfg)
    with jax.default_matmul_precision('highest'):
        cls_list, mask_list = model.apply(
            {'params': params, 'batch_stats': stats}, jnp.asarray(imgs))

    assert len(cls_list) == len(t_cls) == DEC_LAYERS + 1
    for li, (jc, jm, tc, tmk) in enumerate(
            zip(cls_list, mask_list, t_cls, t_mask)):
        cs = np.abs(tc.numpy()).max() + 1e-9
        ms = np.abs(tmk.numpy()).max() + 1e-9
        # tolerance floor: the flax gather-based deformable sampling vs
        # torch grid_sample agree to ~2e-4 per layer (component test);
        # that noise accumulates over ENC_LAYERS + the decoder stack
        np.testing.assert_allclose(np.asarray(jc) / cs, tc.numpy() / cs,
                                   atol=2e-3, err_msg=f'cls layer {li}')
        np.testing.assert_allclose(np.asarray(jm) / ms, tmk.numpy() / ms,
                                   atol=2e-3, err_msg=f'mask layer {li}')


def test_convert_zoo_checkpoint_dispatch(tmp_path):
    """The .pth dispatcher path used by tools/test_vis.py --checkpoint."""
    tm = _randomize(TMask2Former(), seed=3)
    path = str(tmp_path / 'm2f.pth')
    torch.save({'state_dict': tm.state_dict(), 'meta': {}}, path)
    out = TC.convert_zoo_checkpoint(path, 'mask2former', heads=HEADS)
    assert set(out) == {'params', 'batch_stats'}
    assert out['params']['query_feat'].shape == (Q, DIM)
    assert out['params'][f'layer{DEC_LAYERS - 1}'][
        'cross_attn']['query']['kernel'].shape == (DIM, HEADS, DIM // HEADS)
