"""Numerical parity of lax.scan LSTM/GRU against torch.nn with shared weights."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodalreactiongeneration_tpu.nn.recurrent import TorchGRU, TorchLSTM


def torch_params_to_flax(module: torch.nn.Module):
    return {
        "params": {
            name: jnp.asarray(p.detach().numpy())
            for name, p in module.named_parameters()
        }
    }


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_matches_torch(bidirectional, num_layers):
    torch.manual_seed(0)
    B, T, I, H = 3, 11, 7, 5
    t_lstm = torch.nn.LSTM(
        I, H, num_layers=num_layers, batch_first=True, bidirectional=bidirectional
    )
    x = torch.randn(B, T, I)
    with torch.no_grad():
        t_y, (t_h, t_c) = t_lstm(x)

    model = TorchLSTM(
        input_size=I,
        hidden_size=H,
        num_layers=num_layers,
        bidirectional=bidirectional,
    )
    y, (h, c) = model.apply(torch_params_to_flax(t_lstm), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), t_c.numpy(), atol=1e-5)


def test_lstm_state_carry_matches_torch():
    torch.manual_seed(1)
    B, T, I, H = 2, 6, 4, 8
    t_lstm = torch.nn.LSTM(I, H, batch_first=True)
    x1, x2 = torch.randn(B, T, I), torch.randn(B, T, I)
    with torch.no_grad():
        _, st = t_lstm(x1)
        t_y, (t_h, t_c) = t_lstm(x2, st)

    model = TorchLSTM(input_size=I, hidden_size=H)
    params = torch_params_to_flax(t_lstm)
    _, st_j = model.apply(params, jnp.asarray(x1.numpy()))
    y, (h, c) = model.apply(params, jnp.asarray(x2.numpy()), st_j)
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=1e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_gru_matches_torch(bidirectional):
    torch.manual_seed(2)
    B, T, I, H = 3, 9, 6, 5
    t_gru = torch.nn.GRU(I, H, batch_first=True, bidirectional=bidirectional)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        t_y, t_h = t_gru(x)

    model = TorchGRU(input_size=I, hidden_size=H, bidirectional=bidirectional)
    y, h = model.apply(torch_params_to_flax(t_gru), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=1e-5)


def test_lstm_init_shapes():
    import jax

    model = TorchLSTM(input_size=4, hidden_size=3, num_layers=2, bidirectional=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 4)))
    names = set(params["params"].keys())
    assert "weight_ih_l0" in names and "weight_ih_l1_reverse" in names
    assert params["params"]["weight_ih_l1"].shape == (12, 6)


@pytest.mark.slow
@pytest.mark.parametrize("cls", [TorchLSTM, TorchGRU])
def test_pallas_impl_accepts_bfloat16(cls, monkeypatch):
    """bf16 training routes through the f32-only Pallas kernel via casts.

    Regression: compute_dtype=bfloat16 with impl='pallas' crashed on TPU
    ("Invalid dtype for swap. Ref dtype: float32. Value dtype: bfloat16")
    because h0/c0/w_hh reached the kernel in bf16. The pallas branch must
    cast in/out; outputs must match the scan path at bf16 tolerance.
    """
    import functools

    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    import jax

    B, T, I, H = 2, 24, 8, 16  # T >= 16 so impl='pallas' is not demoted
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, I), jnp.bfloat16)
    pallas_model = cls(input_size=I, hidden_size=H, impl="pallas")
    scan_model = cls(input_size=I, hidden_size=H, impl="scan")
    params = pallas_model.init(jax.random.PRNGKey(1), x)
    y_p, s_p = pallas_model.apply(params, x)
    y_s, s_s = scan_model.apply(params, x)
    assert y_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_p, np.float32), np.asarray(y_s, np.float32), atol=3e-2
    )


def test_rnn_impl_env_override(monkeypatch):
    """MRGEN_RNN_IMPL is the deployment escape hatch (e.g. multi-chip
    GSPMD cannot auto-partition the Mosaic kernels)."""
    from multimodalreactiongeneration_tpu.nn.recurrent import resolve_impl

    monkeypatch.delenv("MRGEN_RNN_IMPL", raising=False)
    assert resolve_impl("scan", 100) == "scan"  # explicit arg wins
    assert resolve_impl("auto", 4) == "scan"  # short seq always scans
    monkeypatch.setenv("MRGEN_RNN_IMPL", "scan")
    assert resolve_impl("auto", 100) == "scan"  # env overrides backend
    assert resolve_impl("pallas", 100) == "pallas"  # but not explicit
    monkeypatch.setenv("MRGEN_RNN_IMPL", "pallas")
    assert resolve_impl("auto", 100) == "pallas"


def test_zero_length_sequence():
    """(B, 0, I) inputs: empty outputs, initial state back (the unroll
    heuristic must not pass unroll=0 to lax.scan)."""
    import jax
    import jax.numpy as jnp

    from multimodalreactiongeneration_tpu.nn.recurrent import TorchGRU, TorchLSTM

    lstm = TorchLSTM(input_size=4, hidden_size=3)
    params = lstm.init(jax.random.PRNGKey(0), jnp.zeros((2, 1, 4)))
    ys, (h, c) = lstm.apply(params, jnp.zeros((2, 0, 4)))
    assert ys.shape == (2, 0, 3)
    assert (h == 0).all() and (c == 0).all()

    gru = TorchGRU(input_size=4, hidden_size=3)
    gparams = gru.init(jax.random.PRNGKey(1), jnp.zeros((2, 1, 4)))
    gys, gh = gru.apply(gparams, jnp.zeros((2, 0, 4)))
    assert gys.shape == (2, 0, 3)
    assert (gh == 0).all()
