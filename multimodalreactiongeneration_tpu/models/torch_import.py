"""Per-model torch state_dict -> flax params mapping tables.

The reference's public checkpoint format is a Lightning state_dict
(torch.load(path)["state_dict"], model_loader.py:23-25). These tables map
its parameter paths onto our module tree so reference-trained weights
load directly (train/checkpoint.import_torch_state_dict does the
layout/tensor transforms).

Reference module paths (from the constructors):
  * LSTMwithSample (lstm_with_sample.py:92-130):
      acoustic_projection.{weight,bias}
      sampling_lstm.sampler.{weight_ih_l*,weight_hh_l*,bias_*}
      layerd_lstm.lstm_layered.{i}... with ResidualConnection nesting
        (.module) when use_residual (lstm_block.py:92-99)
      feed_forward.input / feed_forward.mapping
  * SimpleLSTM (simple_lstm.py:48-143): encoders/attention/decoder
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from multimodalreactiongeneration_tpu.train.checkpoint import (
    import_torch_state_dict,
)


def lws_name_map(num_layers: int, use_residual: bool = True,
                 use_layer_norm: bool = True) -> Dict[str, str]:
    """LSTMwithSample mapping (model config num_layers blocks).

    The reference wraps each block's LSTMModule in ResidualConnection
    (prefix gains ``.module``) and keeps a LayerNorm at
    ``lstm_module.layer_norm`` (residual_connection.py:15-17); our
    LSTMBlock names them lstm_module / lstm_norm (nn/lstm_block.py).
    use_feed_forward=False for this model, so blocks have no FFN.
    """
    mapping = {
        "acoustic_projection": "acoustic_projection",
        "sampling_lstm.sampler": "sampling_lstm/sampler",
        "feature_projection": "feature_projection",
        "feed_forward.input": "ff_input",
        "feed_forward.mapping": "ff_mapping",
    }
    for i in range(num_layers):
        ref = f"layerd_lstm.lstm_layered.{i}"
        ours = f"layerd_lstm/block_{i}"
        if use_residual:
            mapping[f"{ref}.lstm_module.module.lstm_module"] = (
                f"{ours}/lstm_module/lstm_module"
            )
            mapping[f"{ref}.lstm_module.module.mixer"] = (
                f"{ours}/lstm_module/mixer"
            )
            if use_layer_norm:
                mapping[f"{ref}.lstm_module.layer_norm"] = f"{ours}/lstm_norm"
        else:
            mapping[f"{ref}.lstm_module.lstm_module"] = (
                f"{ours}/lstm_module/lstm_module"
            )
            mapping[f"{ref}.lstm_module.mixer"] = f"{ours}/lstm_module/mixer"
    return mapping


def import_lws_state_dict(
    state_dict: Dict[str, np.ndarray], model_cfg: Dict[str, Any]
) -> Dict[str, Any]:
    """Reference LSTMwithSample state_dict -> our flax params tree."""
    mapping = lws_name_map(
        model_cfg["num_layers"],
        use_residual=model_cfg.get("use_residual", True),
        use_layer_norm=model_cfg.get("use_layer_norm", True),
    )
    return import_torch_state_dict(state_dict, mapping)


def _lstm_layered_map(ref_prefix: str, our_prefix: str, num_layers: int,
                      use_feed_forward: bool = True) -> Dict[str, str]:
    """LSTMLayerd with use_mixing + use_residual + use_layer_norm (the
    SimpleLSTM configuration): ResidualConnection nests the LSTMModule and
    the FFN under ``.module`` (lstm_block.py:92-99)."""
    m = {}
    for i in range(num_layers):
        ref = f"{ref_prefix}.lstm_layered.{i}"
        ours = f"{our_prefix}/block_{i}"
        m[f"{ref}.lstm_module.module.lstm_module"] = (
            f"{ours}/lstm_module/lstm_module"
        )
        m[f"{ref}.lstm_module.module.mixer"] = f"{ours}/lstm_module/mixer"
        m[f"{ref}.lstm_module.layer_norm"] = f"{ours}/lstm_norm"
        if use_feed_forward:
            m[f"{ref}.feed_forward_module.module.input"] = f"{ours}/ff_input"
            m[f"{ref}.feed_forward_module.module.mapping"] = f"{ours}/ff_mapping"
            m[f"{ref}.feed_forward_module.layer_norm"] = f"{ours}/ff_norm"
    return m


def simple_lstm_name_map(model_cfg: Dict[str, Any]) -> Dict[str, str]:
    """SimpleLSTM mapping (reference simple_lstm.py:48-143)."""
    mapping = {
        "acoustic_encoder.embed_layer": "acoustic_embed",
        "motion_encoder.embed_layer": "motion_embed",
        "motion_decoder.mapping.input": "mapping_input",
        "motion_decoder.mapping.output": "mapping_output",
    }
    mapping.update(_lstm_layered_map(
        "acoustic_encoder.acostic_lstm", "acoustic_lstm",
        model_cfg["acostic_num_layers"],
    ))
    mapping.update(_lstm_layered_map(
        "motion_encoder.motion_lstm", "motion_lstm",
        model_cfg["motion_num_layers"],
    ))
    mapping.update(_lstm_layered_map(
        "motion_decoder.decoder_lstm", "decoder_lstm",
        model_cfg["decoder_num_layers"],
    ))
    for i in range(model_cfg["att_num_layers"]):
        ref = f"multimodal_att.att_layers.{i}.att_module"
        mapping[f"{ref}.module.cross_modal_att"] = f"multimodal_att/att_{i}"
        mapping[f"{ref}.module.projection"] = f"multimodal_att/projection_{i}"
        mapping[f"{ref}.layer_norm"] = f"multimodal_att/norm_{i}"
    return mapping


def import_simple_lstm_state_dict(
    state_dict: Dict[str, np.ndarray], model_cfg: Dict[str, Any]
) -> Dict[str, Any]:
    return import_torch_state_dict(
        state_dict, simple_lstm_name_map(model_cfg)
    )


def strip_lightning_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Lightning sometimes prefixes 'model.'; normalize."""
    if all(k.startswith("model.") for k in state_dict):
        return {k[len("model."):]: v for k, v in state_dict.items()}
    return state_dict
