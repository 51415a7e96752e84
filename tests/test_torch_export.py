"""Checkpoint export round-trip: flax -> torch state_dict -> flax.

import_*(export_*(params)) must reproduce params bit-for-bit, and the
exported names must be the reference modules' own parameter paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalreactiongeneration_tpu.models.lstm_with_sampling import (
    LSTMwithSample,
)
from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
from multimodalreactiongeneration_tpu.models.simple_lstm import SimpleLSTM
from multimodalreactiongeneration_tpu.models.torch_export import (
    export_lws_state_dict,
    export_metaformer_state_dict,
    export_simple_lstm_state_dict,
)
from multimodalreactiongeneration_tpu.models.torch_import import (
    import_lws_state_dict,
    import_metaformer_state_dict,
    import_simple_lstm_state_dict,
)
from tests.test_streaming_models import MF_CFG


def _assert_tree_equal(a, b):
    ja = jax.tree_util.tree_leaves_with_path(a)
    jb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(ja) == len(jb)
    for path, leaf in ja:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(jb[path]))


def test_metaformer_roundtrip_lstm_emb():
    model = Metaformer(cfg=MF_CFG)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 81)), jnp.zeros((1, 2, 18)), jnp.zeros((1, 2, 18)),
    )["params"]
    sd = export_metaformer_state_dict(params, MF_CFG)
    # reference parameter paths (multi_modal_metaformer.py module tree)
    assert (
        "metaformer.metaformer_blocks.0.integrator.integrators.0"
        ".mixer.0.mixer.module.mixer.0.mha.in_proj_weight" in sd
    )
    # feature_embedding.0 is the MAIN modal (self-motion, 18-dim) in the
    # reference too (multi_modal_metaformer.py:486 applies [0] to main)
    assert (
        "metaformer.feature_embedding.0.weight" in sd
        and sd["metaformer.feature_embedding.0.weight"].shape == (32, 18)
    )
    back = import_metaformer_state_dict(sd, MF_CFG)
    _assert_tree_equal(params, back)


def test_metaformer_roundtrip_mha_emb():
    cfg = dict(MF_CFG, emb_mixers=["mha", "mha", "mha"])
    model = Metaformer(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 16, 81)), jnp.zeros((1, 2, 18)), jnp.zeros((1, 2, 18)),
    )["params"]
    back = import_metaformer_state_dict(
        export_metaformer_state_dict(params, cfg), cfg
    )
    _assert_tree_equal(params, back)


def test_lws_roundtrip():
    cfg = dict(
        sampling_rate=16000, shift=160, pred_fps=12.5,
        use_centroid=True, use_angle=True, nmels=26, delta_order=2,
        sampler_hidden_size=16, sampler_num_layers=2,
        sampler_dropout_rate=0.0, hidden_size=32, bottleneck_size=8,
        num_layers=2, num_lstm=1, dropout_rate=0.0, use_layer_norm=True,
        use_mixing=False, use_residual=True, use_relu=True,
    )
    model = LSTMwithSample(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 16, 81)), jnp.zeros((1, 2, 18)), jnp.zeros((1, 2, 18)),
    )["params"]
    sd = export_lws_state_dict(params, cfg)
    assert "sampling_lstm.sampler.weight_ih_l0" in sd
    back = import_lws_state_dict(sd, cfg)
    _assert_tree_equal(params, back)


def test_simple_lstm_roundtrip():
    cfg = dict(
        acostic_feat_size=81, motion_feat_size=18, motion_num_lstm=1,
        acostic_num_lstm=1, acostic_num_layers=2, motion_num_layers=2,
        acostic_lstm_size=16, motion_lstm_size=16, acostic_affine_size=32,
        motion_affine_size=32, acostic_output_size=32, motion_output_size=32,
        att_heads=4, att_num_layers=2, att_use_residual=True,
        att_use_layer_norm=True, dropout_rate=0.0, output_size=18,
        bidirectional=True, use_layer_norm=True, use_relu=True,
        use_mixing=True, use_residual=True, decoder_num_layers=2,
        decoder_num_lstm=1, decoder_lstm_size=16, decoder_affine_size=32,
        decoder_bottleneck_size=8, decoder_output_size=32,
        decoder_mapping_size=8, decoder_bidirectional=True,
        decoder_use_layer_norm=True, decoder_use_relu=True,
        decoder_use_mixing=True, decoder_use_residual=True,
    )
    model = SimpleLSTM(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 24, 81)), jnp.zeros((1, 4, 18))
    )["params"]
    sd = export_simple_lstm_state_dict(params, cfg)
    # packed MHA (kdim == vdim == embed): torch layout restored
    att = "multimodal_att.att_layers.0.att_module.module.cross_modal_att"
    assert f"{att}.in_proj_weight" in sd
    assert sd[f"{att}.in_proj_weight"].shape == (96, 32)
    back = import_simple_lstm_state_dict(sd, cfg)
    _assert_tree_equal(params, back)


def test_export_rejects_unmapped_leaves():
    from multimodalreactiongeneration_tpu.models.torch_export import (
        export_torch_state_dict,
    )

    with pytest.raises(ValueError, match="no torch mapping"):
        export_torch_state_dict(
            {"somewhere": {"kernel": np.zeros((2, 2))}}, {"x": "y"}
        )


def test_export_loads_into_torch_replica_strict():
    """The exported state_dict must load into the reference wiring with
    torch load_state_dict(strict=True) and reproduce OUR outputs in
    torch — the full 'train here, infer in the reference stack' path."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_import_lws import CFG, TorchRefLSTMwithSample

    model = LSTMwithSample(cfg=CFG)
    params = model.init(
        jax.random.PRNGKey(4),
        jnp.zeros((1, 16, 81)), jnp.zeros((1, 2, 18)), jnp.zeros((1, 2, 18)),
    )["params"]
    sd = export_lws_state_dict(params, CFG)

    t_model = TorchRefLSTMwithSample(CFG)
    t_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()},
        strict=True,
    )
    t_model.eval()

    rng = np.random.default_rng(11)
    fb = rng.normal(size=(2, 16, 81)).astype(np.float32)
    mp = rng.normal(size=(2, 2, 18)).astype(np.float32)
    ms = rng.normal(size=(2, 2, 18)).astype(np.float32)
    ours, _ = model.apply(
        {"params": params}, jnp.asarray(fb), jnp.asarray(mp), jnp.asarray(ms)
    )
    with torch.no_grad():
        theirs = t_model(
            torch.from_numpy(fb), torch.from_numpy(mp), torch.from_numpy(ms)
        )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=2e-5
    )


def test_unpacked_qkv_roundtrip():
    """MHA with kdim/vdim != embed_dim: torch keeps q/k/v projections as
    separate attributes (packed bias). Export must emit that layout and
    import must read it back verbatim."""
    from multimodalreactiongeneration_tpu.models.torch_export import (
        export_torch_state_dict,
    )
    from multimodalreactiongeneration_tpu.train.checkpoint import (
        import_torch_state_dict,
    )

    rng = np.random.default_rng(12)
    e, kdim = 8, 6
    params = {"att": {
        "q_proj_weight": rng.normal(size=(e, e)).astype(np.float32),
        "k_proj_weight": rng.normal(size=(e, kdim)).astype(np.float32),
        "v_proj_weight": rng.normal(size=(e, kdim)).astype(np.float32),
        "q_proj_bias": rng.normal(size=(e,)).astype(np.float32),
        "k_proj_bias": rng.normal(size=(e,)).astype(np.float32),
        "v_proj_bias": rng.normal(size=(e,)).astype(np.float32),
        "out_proj_weight": rng.normal(size=(e, e)).astype(np.float32),
        "out_proj_bias": rng.normal(size=(e,)).astype(np.float32),
    }}
    nm = {"block.cross_att": "att"}
    sd = export_torch_state_dict(params, nm)
    assert "block.cross_att.q_proj_weight" in sd  # unpacked weights
    assert "block.cross_att.in_proj_bias" in sd  # bias always packed
    assert "block.cross_att.in_proj_weight" not in sd
    back = import_torch_state_dict(sd, nm)
    _assert_tree_equal(params, back)
