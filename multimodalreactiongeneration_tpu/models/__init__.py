"""Model registry (reference mr_gen/model/model_loader.py:10-26)."""

from __future__ import annotations

from typing import Any, Dict

from multimodalreactiongeneration_tpu.models.lstm_with_sampling import LSTMwithSample
from multimodalreactiongeneration_tpu.models.lstmformer import Metaformer
from multimodalreactiongeneration_tpu.models.simple_lstm import SimpleLSTM

MODEL_TYPE = {
    "simple_lstm": SimpleLSTM,
    "lstm_with_sampling": LSTMwithSample,
    "lstmformer": Metaformer,
}


def build_model(model_type: str, model_cfg: Dict[str, Any]):
    """Construct a model module from its config group."""
    if model_type not in MODEL_TYPE:
        raise ValueError(
            f"model_type must be one of {sorted(MODEL_TYPE)}, got {model_type!r}"
        )
    cls = MODEL_TYPE[model_type]
    cfg = model_cfg.to_dict() if hasattr(model_cfg, "to_dict") else dict(model_cfg)
    return cls(cfg=cfg)


def load_model(model_type: str, ckpt_path: str, model_cfg):
    """name -> (model, restored params) (reference load_model :13-26)."""
    from multimodalreactiongeneration_tpu.train.checkpoint import load_checkpoint

    model = build_model(model_type, model_cfg)
    payload = load_checkpoint(ckpt_path)
    return model, payload["params"]
