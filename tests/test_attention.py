"""TorchMHA parity against torch.nn.MultiheadAttention with shared weights."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodalreactiongeneration_tpu.nn.attention import TorchMHA


def copy_params(t_mha: torch.nn.MultiheadAttention, embed_dim):
    sd = {k: v.detach().numpy() for k, v in t_mha.state_dict().items()}
    if "in_proj_weight" in sd:
        w = sd["in_proj_weight"]
        w_q, w_k, w_v = np.split(w, 3, axis=0)
    else:
        w_q, w_k, w_v = (
            sd["q_proj_weight"],
            sd["k_proj_weight"],
            sd["v_proj_weight"],
        )
    b_q, b_k, b_v = np.split(sd["in_proj_bias"], 3, axis=0)
    return {
        "params": {
            "q_proj_weight": jnp.asarray(w_q),
            "k_proj_weight": jnp.asarray(w_k),
            "v_proj_weight": jnp.asarray(w_v),
            "q_proj_bias": jnp.asarray(b_q),
            "k_proj_bias": jnp.asarray(b_k),
            "v_proj_bias": jnp.asarray(b_v),
            "out_proj_weight": jnp.asarray(sd["out_proj.weight"]),
            "out_proj_bias": jnp.asarray(sd["out_proj.bias"]),
        }
    }


@pytest.mark.parametrize("heads", [1, 4])
def test_self_attention_matches_torch(heads):
    torch.manual_seed(0)
    B, L, E = 2, 10, 16
    t_mha = torch.nn.MultiheadAttention(E, heads, batch_first=True)
    x = torch.randn(B, L, E)
    with torch.no_grad():
        t_y, _ = t_mha(x, x, x, need_weights=False)

    model = TorchMHA(embed_dim=E, num_heads=heads)
    xj = jnp.asarray(x.numpy())
    y = model.apply(copy_params(t_mha, E), xj, xj, xj)
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)


def test_kdim_vdim_cross_attention_matches_torch():
    # the simple_lstm MultimodalAttention configuration (multi_modal_att.py:12-19)
    torch.manual_seed(1)
    B, L, S, E, KD = 2, 6, 12, 16, 24
    t_mha = torch.nn.MultiheadAttention(
        E, 4, batch_first=True, kdim=KD, vdim=KD
    )
    q, kv = torch.randn(B, L, E), torch.randn(B, S, KD)
    with torch.no_grad():
        t_y, _ = t_mha(q, kv, kv, need_weights=False)

    model = TorchMHA(embed_dim=E, num_heads=4, kdim=KD, vdim=KD)
    y = model.apply(
        copy_params(t_mha, E), jnp.asarray(q.numpy()), jnp.asarray(kv.numpy()),
        jnp.asarray(kv.numpy()),
    )
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)


def test_bool_mask_matches_torch():
    torch.manual_seed(2)
    B, L, E, H = 2, 8, 16, 2
    t_mha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    x = torch.randn(B, L, E)
    causal = torch.triu(torch.ones(L, L, dtype=torch.bool), 1)
    with torch.no_grad():
        t_y, _ = t_mha(x, x, x, attn_mask=causal, need_weights=False)

    model = TorchMHA(embed_dim=E, num_heads=H)
    xj = jnp.asarray(x.numpy())
    y = model.apply(
        copy_params(t_mha, E), xj, xj, xj, jnp.asarray(causal.numpy())
    )
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)


def test_fully_masked_row_is_finite():
    # deviation by design: reference/torch would produce NaN
    import jax

    model = TorchMHA(embed_dim=8, num_heads=2)
    x = jnp.ones((1, 4, 8))
    mask = jnp.ones((4, 4), dtype=bool)  # everything masked
    params = model.init(jax.random.PRNGKey(0), x, x, x)
    y = model.apply(params, x, x, x, mask)
    assert np.isfinite(np.asarray(y)).all()


def test_attend_raw_folds_projections_exactly():
    """attend_raw (shared-KV decode: K/V projections folded into the
    query/output sides) is an EXACT reassociation of __call__(q, x, x):
    the k-bias adds a per-query constant to every key's logit (softmax
    shift-invariant), the v-bias returns additively because attention
    weights sum to 1. Verified with NONZERO random biases at highest
    matmul precision (at default precision the two formulations round
    differently on purpose — that is the speed)."""
    import jax

    B, Lq, S, E, kdim = 2, 3, 11, 32, 24
    model = TorchMHA(embed_dim=E, num_heads=4, kdim=kdim, vdim=kdim)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Lq, E))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, kdim))
    params = model.init(jax.random.PRNGKey(2), q, x, x)
    # init biases are zeros: inject random ones so the bias-folding
    # algebra is actually exercised
    leaves = dict(params["params"])
    for i, name in enumerate(
        ("q_proj_bias", "k_proj_bias", "v_proj_bias", "out_proj_bias")
    ):
        leaves[name] = jax.random.normal(
            jax.random.PRNGKey(100 + i), leaves[name].shape
        )
    params = {"params": leaves}
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.3, (B, Lq, S))

    with jax.default_matmul_precision("highest"):
        ref = model.apply(params, q, x, x, mask)
        raw = model.apply(params, q, x, mask, method=TorchMHA.attend_raw)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(ref), atol=2e-5)

    # fully-masked rows keep the uniform-average degradation
    full = jnp.ones((B, Lq, S), bool)
    with jax.default_matmul_precision("highest"):
        ref_f = model.apply(params, q, x, x, full)
        raw_f = model.apply(params, q, x, full, method=TorchMHA.attend_raw)
    assert np.isfinite(np.asarray(raw_f)).all()
    np.testing.assert_allclose(np.asarray(raw_f), np.asarray(ref_f), atol=2e-5)
