"""flax params -> reference torch state_dict export (inverse importer).

Completes checkpoint-format round-tripping: torch_import.py loads
reference Lightning checkpoints onto our modules; this module writes a
model trained HERE back out as a state_dict the reference's own
``load_model`` (torch.load(path)["state_dict"] -> load_state_dict,
/root/reference/mr_gen/model/model_loader.py:13-26) accepts — so a
reference user can adopt this framework for training without giving up
their torch inference/visualization stack.

The per-model name maps are the importer's own (torch_import.py);
``export_torch_state_dict`` inverts the leaf transforms of
train/checkpoint.import_torch_state_dict:
  * ``kernel`` -> ``.weight`` transposed back (in,out)->(out,in)
  * LayerNorm ``scale`` -> ``.weight``
  * LSTM/GRU ``weight_ih*``/``bias_*`` verbatim (torch layout throughout)
  * MHA q/k/v projections re-packed into ``in_proj_weight``/``in_proj_bias``
    when kdim==vdim==embed_dim (torch's _qkv_same_embed_dim), else left
    as ``q_proj_weight``/``k_proj_weight``/``v_proj_weight`` (+ packed
    ``in_proj_bias``), exactly mirroring torch.nn.MultiheadAttention's
    parameter layout.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from multimodalreactiongeneration_tpu.models.torch_import import (
    lws_name_map,
    metaformer_name_map,
    simple_lstm_name_map,
)

_RNN_LEAVES = ("weight_ih", "weight_hh", "bias_ih", "bias_hh")


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def export_torch_state_dict(
    params: Dict[str, Any], name_map: Dict[str, str]
) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_state_dict: flax params -> torch tensors.

    params: the flax tree (with or without the top-level "params" key).
    name_map: torch prefix -> flax prefix (the importer's table).
    Raises on leaves no mapping covers — a silent partial export would
    produce a checkpoint torch's load_state_dict rejects anyway.
    """
    if set(params) == {"params"}:
        params = params["params"]
    flat = _flatten(params)
    # invert: flax prefix -> torch prefix, matched longest-first on
    # whole path components
    inverse = sorted(
        ((v, k) for k, v in name_map.items()), key=lambda x: -len(x[0])
    )

    out: Dict[str, np.ndarray] = {}
    qkv: Dict[str, Dict[str, np.ndarray]] = {}  # torch base -> part -> arr
    unmapped = []
    for path, arr in flat.items():
        base = None
        for flax_prefix, torch_prefix in inverse:
            if path == flax_prefix or path.startswith(flax_prefix + "/"):
                base = torch_prefix
                rest = path[len(flax_prefix):].lstrip("/")
                break
        if base is None:
            unmapped.append(path)
            continue

        leaf = rest.rsplit("/", 1)[-1]
        dirs = rest[: -len(leaf)].rstrip("/").replace("/", ".")
        tbase = f"{base}.{dirs}" if dirs else base

        if leaf in ("q_proj_weight", "k_proj_weight", "v_proj_weight",
                    "q_proj_bias", "k_proj_bias", "v_proj_bias"):
            qkv.setdefault(tbase, {})[leaf] = arr
        elif leaf == "out_proj_weight":
            out[f"{tbase}.out_proj.weight"] = arr
        elif leaf == "out_proj_bias":
            out[f"{tbase}.out_proj.bias"] = arr
        elif leaf.startswith(_RNN_LEAVES):
            out[f"{tbase}.{leaf}"] = arr
        elif leaf == "kernel":
            out[f"{tbase}.weight"] = np.ascontiguousarray(arr.T)
        elif leaf == "scale":  # LayerNorm
            out[f"{tbase}.weight"] = arr
        elif leaf == "bias":
            out[f"{tbase}.bias"] = arr
        else:
            unmapped.append(path)

    for tbase, parts in qkv.items():
        q, k, v = (parts.get(f"{p}_proj_weight") for p in "qkv")
        if q is None or k is None or v is None:
            raise ValueError(f"incomplete q/k/v projections under {tbase}")
        e = q.shape[0]
        if k.shape[1] == e and v.shape[1] == e:
            out[f"{tbase}.in_proj_weight"] = np.concatenate([q, k, v], 0)
        else:  # torch keeps them separate when kdim/vdim differ
            out[f"{tbase}.q_proj_weight"] = q
            out[f"{tbase}.k_proj_weight"] = k
            out[f"{tbase}.v_proj_weight"] = v
        if f"q_proj_bias" in parts:
            out[f"{tbase}.in_proj_bias"] = np.concatenate(
                [parts[f"{p}_proj_bias"] for p in "qkv"], 0
            )

    if unmapped:
        raise ValueError(
            f"{len(unmapped)} parameter leaves have no torch mapping, "
            f"e.g. {unmapped[:5]}"
        )
    return out


def export_simple_lstm_state_dict(params, model_cfg: Dict[str, Any]):
    return export_torch_state_dict(params, simple_lstm_name_map(model_cfg))


def export_lws_state_dict(params, model_cfg: Dict[str, Any]):
    return export_torch_state_dict(
        params,
        lws_name_map(
            model_cfg["num_layers"],
            use_residual=model_cfg.get("use_residual", True),
            use_layer_norm=model_cfg.get("use_layer_norm", True),
        ),
    )


def export_metaformer_state_dict(params, model_cfg: Dict[str, Any]):
    return export_torch_state_dict(params, metaformer_name_map(model_cfg))


_EXPORTERS = {
    "simple_lstm": export_simple_lstm_state_dict,
    "lstm_with_sampling": export_lws_state_dict,
    "lstmformer": export_metaformer_state_dict,
}


def main(argv=None):
    """python -m multimodalreactiongeneration_tpu.models.torch_export \\
        --config configs/lstmformer.yaml --ckpt ckpts/run/last --out ref.ckpt

    Reads one of this framework's orbax checkpoints and writes a
    PyTorch-Lightning-style .ckpt (torch.save of {"state_dict", "epoch"})
    loadable by the reference's model_loader.
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--out", required=True, help="output .ckpt file")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    import torch

    from multimodalreactiongeneration_tpu.train.checkpoint import (
        load_checkpoint,
    )
    from multimodalreactiongeneration_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    payload = load_checkpoint(args.ckpt)
    sd = _EXPORTERS[cfg.exp.use_model](
        payload["params"], cfg.model.to_dict()
    )
    torch.save(
        {
            "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()},
            "epoch": int(payload.get("epoch", 0)),
        },
        args.out,
    )
    print(f"exported {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
