"""Full-model checkpoint import for the Metaformer: pure-torch replica of
the reference's module tree (multi_modal_metaformer.py + mixer_block.py
nesting, intent semantics) -> mapping table -> identical outputs."""

import pytest
import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
from multimodalreactiongeneration_tpu.models.torch_import import (
    import_metaformer_state_dict,
)
from multimodalreactiongeneration_tpu.ops.masks import (
    merged_attention_mask,
)


pytestmark = pytest.mark.slow
H = 16
CFG = dict(
    main_modal_idx=2,
    hidden_size=H,
    num_block=2,
    dropout=0.0,
    num_layerd=1,
    encoder_num_layer=2,
    num_internal_layer=1,
    residual=True,
    residual_layer_norm=True,
    bias=True,
    emb_mixers=["lstm", "lstm", "lstm"],
    bottleneck_size=8,
    nonlinearity="none",
    ffn_nonlinearity="relu",
    proj_size=0,
    num_heads=2,
    add_bias_kv=False,
    add_zero_attn=False,
    max_context_len=10,
    repeat_with_encoder=False,
    interlayer_residual=False,
    interlayer_residual_norm=True,
    sampling_rate=16000,
    shift=160,
    pred_fps=12.5,
    modalities=["audio", "motion", "motion"],
    use_centroid=True,
    use_angle=True,
    nmels=26,
    delta_order=2,
)
RATIO = 8


class Res(tnn.Module):
    def __init__(self, module, dim):
        super().__init__()
        self.module = module
        self.layer_norm = tnn.LayerNorm(dim)

    def forward(self, x, *args):
        return self.layer_norm(self.module(x, *args) + x)


class RefFF(tnn.Module):
    """FeedForward (mixer_block.py:37-87)."""

    def __init__(self, dim, bottleneck, nonlinearity, residual, out_dim=None):
        super().__init__()
        out_dim = dim if out_dim is None else out_dim
        if nonlinearity == "none":
            seq = tnn.Sequential()
            seq.add_module("feedforward", tnn.Linear(dim, out_dim))
        else:
            seq = tnn.Sequential()
            seq.add_module("input", tnn.Linear(dim, bottleneck))
            seq.add_module("activation", tnn.ReLU())
            seq.add_module("output", tnn.Linear(bottleneck, out_dim))
        self.feed_forward = Res(seq, dim) if residual else seq

    def forward(self, x):
        return self.feed_forward(x)


class RefLSTMMixerBlock(tnn.Module):
    def __init__(self):
        super().__init__()

        class LSTMMixer(tnn.Module):
            def __init__(self):
                super().__init__()
                self.mixer = tnn.LSTM(H, H, batch_first=True)

            def forward(self, x):
                return self.mixer(x)[0]

        self.mixer = Res(LSTMMixer(), H)
        self.feed_forward = RefFF(H, 8, "none", True)

    def forward(self, x):
        return self.feed_forward(self.mixer(x))


class RefMHAMixerBlock(tnn.Module):
    def __init__(self):
        super().__init__()

        class MHAMixer(tnn.Module):
            def __init__(self):
                super().__init__()
                inner = tnn.Module()
                inner.mha = tnn.MultiheadAttention(
                    H, CFG["num_heads"], batch_first=True, kdim=H, vdim=H
                )
                self.mixer = tnn.ModuleList([inner])

            def forward(self, q, k, v, mask):
                y, _ = self.mixer[0].mha(q, k, v, attn_mask=mask,
                                         need_weights=False)
                return y

        self.mixer = Res(MHAMixer(), H)
        self.feed_forward = RefFF(H, 8, "none", True)

    def forward(self, q, k, v, mask):
        return self.feed_forward(self.mixer(q, k, v, mask))


class RefMetaformer(tnn.Module):
    """The reference MultiModalMetaformer wiring with intent semantics."""

    def __init__(self):
        super().__init__()
        inner = tnn.Module()
        inner.feature_embedding = tnn.ModuleList(
            [tnn.Linear(d, H) for d in (18, 81, 18)]
        )

        blocks = []
        for b in range(CFG["num_block"]):
            blk = tnn.Module()
            emb = tnn.Module()
            n_emb = 3 if b == 0 else 1
            mods = []
            for m in range(n_emb):
                layerd = tnn.Module()
                n_j = CFG["num_layerd"] if m == 0 else CFG["encoder_num_layer"]
                layerd.mixer = tnn.ModuleList(
                    [RefLSTMMixerBlock() for _ in range(n_j)]
                )
                mods.append(layerd)
            emb.modal_embeddings = tnn.ModuleList(mods)
            blk.embedding = emb

            integ = tnn.Module()
            integs = []
            for _ in range(2):
                layerd = tnn.Module()
                layerd.mixer = tnn.ModuleList([RefMHAMixerBlock()])
                integs.append(layerd)
            integ.integrators = tnn.ModuleList(integs)
            integ.cat_linear = tnn.Linear(2 * H, H)
            blk.integrator = integ

            blk.feedforward = RefFF(H, 8, "relu", True)
            blocks.append(blk)
        inner.metaformer_blocks = tnn.ModuleList(blocks)
        inner.output_feedforward = RefFF(H, 8, "relu", False, out_dim=18)
        self.metaformer = inner

    def forward(self, main, others, cross_masks):
        mf = self.metaformer
        main = mf.feature_embedding[0](main)
        others = [
            mf.feature_embedding[i + 1](o) for i, o in enumerate(others)
        ]
        for b, blk in enumerate(mf.metaformer_blocks):
            if b == 0:
                main_e = blk.embedding.modal_embeddings[0]
                for blkj in main_e.mixer:
                    main = blkj(main)
                new_others = []
                for m, o in enumerate(others):
                    layerd = blk.embedding.modal_embeddings[m + 1]
                    for blkj in layerd.mixer:
                        o = blkj(o)
                    new_others.append(o)
                others = new_others
            else:
                for blkj in blk.embedding.modal_embeddings[0].mixer:
                    main = blkj(main)
            ys = []
            for i, integ in enumerate(blk.integrator.integrators):
                ys.append(
                    integ.mixer[0](main, others[i], others[i], cross_masks[i])
                )
            main = blk.feedforward(
                blk.integrator.cat_linear(torch.cat(ys, dim=-1))
            )
        return mf.output_feedforward(main)


def test_metaformer_full_import():
    torch.manual_seed(0)
    t_model = RefMetaformer()
    B, T = 2, 4
    a = torch.randn(B, T * RATIO, 81)
    mp = torch.randn(B, T, 18)
    ms = torch.randn(B, T, 18)

    # masks: torch path wants per-(B*H) bool masks like the reference
    ma = np.asarray(merged_attention_mask(ms.numpy(), a.numpy()))
    mm = np.asarray(merged_attention_mask(ms.numpy(), mp.numpy()))

    def to_torch_mask(m):
        t = torch.from_numpy(m)[:, None].repeat(1, CFG["num_heads"], 1, 1)
        return t.reshape(-1, m.shape[1], m.shape[2])

    with torch.no_grad():
        t_y = t_model(
            ms, [a, mp], [to_torch_mask(ma), to_torch_mask(mm)]
        )

    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = {"params": import_metaformer_state_dict(sd, CFG)}

    model = Metaformer(cfg=CFG)
    y, _ = model.apply(
        params,
        jnp.asarray(a.numpy()),
        jnp.asarray(mp.numpy()),
        jnp.asarray(ms.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=2e-5)


class RefMetaformerMhaAudio(RefMetaformer):
    """Variant with the audio embedding as MHA self-attention blocks
    (reference emb_mixers audio='mha'); everything else LSTM."""

    def __init__(self):
        super().__init__()
        # replace the audio modality's block-0 embedding (modal index 1)
        blk0 = self.metaformer.metaformer_blocks[0]
        layerd = tnn.Module()
        layerd.mixer = tnn.ModuleList(
            [RefMHAMixerBlock() for _ in range(CFG["encoder_num_layer"])]
        )
        blk0.embedding.modal_embeddings[1] = layerd

    def forward(self, main, others, cross_masks, audio_self_mask):
        mf = self.metaformer
        main = mf.feature_embedding[0](main)
        others = [
            mf.feature_embedding[i + 1](o) for i, o in enumerate(others)
        ]
        for b, blk in enumerate(mf.metaformer_blocks):
            if b == 0:
                for blkj in blk.embedding.modal_embeddings[0].mixer:
                    main = blkj(main)
                new_others = []
                for m, o in enumerate(others):
                    layerd = blk.embedding.modal_embeddings[m + 1]
                    for blkj in layerd.mixer:
                        if m == 0:  # audio: mha self-attention
                            o = blkj(o, o, o, audio_self_mask)
                        else:
                            o = blkj(o)
                    new_others.append(o)
                others = new_others
            else:
                for blkj in blk.embedding.modal_embeddings[0].mixer:
                    main = blkj(main)
            ys = []
            for i, integ in enumerate(blk.integrator.integrators):
                ys.append(
                    integ.mixer[0](main, others[i], others[i], cross_masks[i])
                )
            main = blk.feedforward(
                blk.integrator.cat_linear(torch.cat(ys, dim=-1))
            )
        return mf.output_feedforward(main)


def test_metaformer_mha_audio_embedding_import():
    """Torch golden for the mha-embedding path: same weights, same masks,
    same outputs (previously only self-consistency tested)."""
    torch.manual_seed(3)
    t_model = RefMetaformerMhaAudio()
    B, T = 2, 4
    a = torch.randn(B, T * RATIO, 81)
    mp = torch.randn(B, T, 18)
    ms = torch.randn(B, T, 18)

    ma = np.asarray(merged_attention_mask(ms.numpy(), a.numpy()))
    mm = np.asarray(merged_attention_mask(ms.numpy(), mp.numpy()))
    aa = np.asarray(merged_attention_mask(a.numpy(), a.numpy()))

    def to_torch_mask(m):
        t = torch.from_numpy(m)[:, None].repeat(1, CFG["num_heads"], 1, 1)
        return t.reshape(-1, m.shape[1], m.shape[2])

    with torch.no_grad():
        t_y = t_model(
            ms, [a, mp],
            [to_torch_mask(ma), to_torch_mask(mm)],
            to_torch_mask(aa),
        )

    cfg = dict(CFG, emb_mixers=["mha", "lstm", "lstm"])
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = {"params": import_metaformer_state_dict(sd, cfg)}

    model = Metaformer(cfg=cfg)
    y, _ = model.apply(
        params,
        jnp.asarray(a.numpy()),
        jnp.asarray(mp.numpy()),
        jnp.asarray(ms.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=3e-5)


def test_metaformer_gru_embedding_import():
    """Torch golden for gru embeddings (configs/lstmformer_gru.yaml
    path): swap every embedding LSTM for nn.GRU, same wiring."""
    torch.manual_seed(4)
    t_model = RefMetaformer()
    # replace each embedding mixer's LSTM with a GRU in place
    for blk in t_model.metaformer.metaformer_blocks:
        for layerd in blk.embedding.modal_embeddings:
            for mixer_block in layerd.mixer:
                mixer_block.mixer.module.mixer = tnn.GRU(
                    H, H, batch_first=True
                )

    B, T = 2, 4
    a = torch.randn(B, T * RATIO, 81)
    mp = torch.randn(B, T, 18)
    ms = torch.randn(B, T, 18)
    ma = np.asarray(merged_attention_mask(ms.numpy(), a.numpy()))
    mm = np.asarray(merged_attention_mask(ms.numpy(), mp.numpy()))

    def to_torch_mask(m):
        t = torch.from_numpy(m)[:, None].repeat(1, CFG["num_heads"], 1, 1)
        return t.reshape(-1, m.shape[1], m.shape[2])

    with torch.no_grad():
        t_y = t_model(ms, [a, mp], [to_torch_mask(ma), to_torch_mask(mm)])

    cfg = dict(CFG, emb_mixers=["gru", "gru", "gru"])
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = {"params": import_metaformer_state_dict(sd, cfg)}
    model = Metaformer(cfg=cfg)
    y, _ = model.apply(
        params,
        jnp.asarray(a.numpy()),
        jnp.asarray(mp.numpy()),
        jnp.asarray(ms.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=3e-5)
