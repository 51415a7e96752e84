"""Mask parity: our iota formulation vs a torch re-execution of the
reference's tile/triu/transpose algorithm
(/root/reference/mr_gen/model/utils/multi_modal_metaformer.py:32-79)."""

import numpy as np
import pytest
import torch

from multimodalreactiongeneration_tpu.ops import masks


def torch_reference_mask(main, other, head_num, padding_value=-100.0):
    # independent re-execution of the published algorithm for testing
    main_len, other_len = main.shape[1], other.shape[1]
    batch = main.shape[0]
    if other_len % main_len == 0:
        rate = other_len // main_len
        m = torch.triu(torch.ones(main_len, main_len, dtype=torch.bool), 1)
        m = torch.tile(m, (1, rate)).view(main_len, rate, main_len)
        m = m.transpose(1, 2).contiguous().view(main_len, other_len)
    else:
        rate = main_len // other_len
        m = torch.triu(torch.ones(other_len, other_len, dtype=torch.bool), 1)
        m = torch.tile(m, (rate, 1)).view(rate, other_len, other_len)
        m = m.transpose(1, 0).contiguous().view(main_len, other_len)
    attn = m[None, None].repeat(batch, head_num, 1, 1)
    mp = (main[:, :, 0] == padding_value).float().unsqueeze(-1)
    op = (other[:, :, 0] == padding_value).float().unsqueeze(1)
    pad = torch.matmul(mp, op).bool().unsqueeze(1).repeat(1, head_num, 1, 1)
    return attn + pad


@pytest.mark.parametrize("q_len,k_len", [(4, 32), (32, 4), (8, 8), (5, 40)])
def test_causal_matches_reference(q_len, k_len):
    main = torch.randn(2, q_len, 6)
    other = torch.randn(2, k_len, 6)
    ref = torch_reference_mask(main, other, head_num=3).numpy()
    ours = np.asarray(
        masks.merged_attention_mask(main.numpy(), other.numpy())
    )
    # ours is (B, L, S); reference repeats per head
    np.testing.assert_array_equal(
        np.broadcast_to(ours[:, None], ref.shape), ref
    )


def test_padding_pairs_only():
    main = torch.randn(1, 4, 3)
    other = torch.randn(1, 8, 3)
    main[0, 3, :] = -100.0
    other[0, 6:, :] = -100.0
    ref = torch_reference_mask(main, other, head_num=1).numpy()[:, 0]
    ours = np.asarray(masks.merged_attention_mask(main.numpy(), other.numpy()))
    np.testing.assert_array_equal(ours, ref)
    # pad query attending a REAL key is allowed (reference quirk kept)
    assert not ours[0, 3, 0]
    # pad query attending a pad key is masked
    assert ours[0, 3, 6]


def test_incompatible_lengths_raise():
    with pytest.raises(ValueError):
        masks.rectangular_causal_mask(3, 7)


def test_bias_values():
    m = masks.rectangular_causal_mask(2, 4)
    b = np.asarray(masks.mask_to_bias(m))
    assert (b[m] < -1e29).all()
    assert (b[~np.asarray(m)] == 0).all()
