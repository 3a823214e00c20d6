"""HuggingFace checkpoint -> JAX param-pytree converters.

The frozen LMs (T0-3B, GPT-2) and CLIP are published as torch checkpoints;
these converters map their state_dicts onto our stacked-layer pytrees.
Torch is used host-side only (CPU tensors -> numpy); nothing torch touches
the TPU compute path.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]


def _np(tensor: Any, dtype: Any = np.float32) -> np.ndarray:
    if hasattr(tensor, "detach"):
        tensor = tensor.detach().cpu().numpy()
    return np.asarray(tensor, dtype=dtype)


def _stack(sd: Mapping[str, Any], template: str, n_layers: int,
           transpose: bool = False, dtype: Any = np.float32) -> np.ndarray:
    arrays = []
    for i in range(n_layers):
        arr = _np(sd[template.format(i)], dtype)
        arrays.append(arr.T if transpose else arr)
    return np.stack(arrays)


def t5_params_from_hf(state_dict: Mapping[str, Any], cfg,
                      dtype: Any = np.float32) -> Params:
    """Convert a HF T5ForConditionalGeneration state_dict (T5 v1.1 layout,
    gated act) to our stacked pytree (see models/t5.py)."""
    sd = state_dict
    ne, nd = cfg.num_encoder_layers, cfg.num_decoder_layers

    def attn_block(prefix: str, n: int, layer_idx: int) -> Params:
        base = prefix + ".block.{}.layer.%d.%s.{}.weight"
        kind = "SelfAttention" if layer_idx == 0 else "EncDecAttention"
        return {
            name: _stack(
                sd, prefix + ".block.{}" +
                f".layer.{layer_idx}.{kind}.{name}.weight",
                n, transpose=True, dtype=dtype,
            )
            for name in ("q", "k", "v", "o")
        }

    def ffn_block(prefix: str, n: int, layer_idx: int) -> Params:
        out = {
            "wi_0": _stack(
                sd, prefix + ".block.{}" +
                f".layer.{layer_idx}.DenseReluDense.wi_0.weight",
                n, transpose=True, dtype=dtype,
            ),
            "wo": _stack(
                sd, prefix + ".block.{}" +
                f".layer.{layer_idx}.DenseReluDense.wo.weight",
                n, transpose=True, dtype=dtype,
            ),
        }
        if cfg.is_gated_act:
            out["wi_1"] = _stack(
                sd, prefix + ".block.{}" +
                f".layer.{layer_idx}.DenseReluDense.wi_1.weight",
                n, transpose=True, dtype=dtype,
            )
        return out

    def lns(prefix: str, n: int, count: int) -> Params:
        return {
            f"ln{i}": _stack(
                sd, prefix + ".block.{}" + f".layer.{i}.layer_norm.weight",
                n, dtype=dtype,
            )
            for i in range(count)
        }

    params: Params = {
        "shared": _np(sd["shared.weight"], dtype),
        "encoder": {
            "self_attn": attn_block("encoder", ne, 0),
            "ffn": ffn_block("encoder", ne, 1),
            **lns("encoder", ne, 2),
            "rel_bias": _np(
                sd["encoder.block.0.layer.0.SelfAttention."
                   "relative_attention_bias.weight"], dtype
            ),
            "final_ln": _np(sd["encoder.final_layer_norm.weight"], dtype),
        },
        "decoder": {
            "self_attn": attn_block("decoder", nd, 0),
            "cross_attn": attn_block("decoder", nd, 1),
            "ffn": ffn_block("decoder", nd, 2),
            **lns("decoder", nd, 3),
            "rel_bias": _np(
                sd["decoder.block.0.layer.0.SelfAttention."
                   "relative_attention_bias.weight"], dtype
            ),
            "final_ln": _np(sd["decoder.final_layer_norm.weight"], dtype),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _np(sd["lm_head.weight"], dtype).T
    return params


def gpt2_params_from_hf(state_dict: Mapping[str, Any], cfg,
                        dtype: Any = np.float32) -> Params:
    """Convert a HF GPT2LMHeadModel state_dict to our stacked pytree
    (see models/gpt2.py). HF GPT-2 Conv1D stores weights as (in, out), the
    orientation we use — no transpose needed."""
    sd = {k.removeprefix("transformer."): v for k, v in state_dict.items()}
    n = cfg.num_layers
    params: Params = {
        "wte": _np(sd["wte.weight"], dtype),
        "wpe": _np(sd["wpe.weight"], dtype),
        "blocks": {
            "ln1_scale": _stack(sd, "h.{}.ln_1.weight", n, dtype=dtype),
            "ln1_bias": _stack(sd, "h.{}.ln_1.bias", n, dtype=dtype),
            "attn_qkv": _stack(sd, "h.{}.attn.c_attn.weight", n, dtype=dtype),
            "attn_qkv_bias": _stack(sd, "h.{}.attn.c_attn.bias", n,
                                    dtype=dtype),
            "attn_out": _stack(sd, "h.{}.attn.c_proj.weight", n, dtype=dtype),
            "attn_out_bias": _stack(sd, "h.{}.attn.c_proj.bias", n,
                                    dtype=dtype),
            "ln2_scale": _stack(sd, "h.{}.ln_2.weight", n, dtype=dtype),
            "ln2_bias": _stack(sd, "h.{}.ln_2.bias", n, dtype=dtype),
            "mlp_fc": _stack(sd, "h.{}.mlp.c_fc.weight", n, dtype=dtype),
            "mlp_fc_bias": _stack(sd, "h.{}.mlp.c_fc.bias", n, dtype=dtype),
            "mlp_proj": _stack(sd, "h.{}.mlp.c_proj.weight", n, dtype=dtype),
            "mlp_proj_bias": _stack(sd, "h.{}.mlp.c_proj.bias", n,
                                    dtype=dtype),
        },
        "ln_f_scale": _np(sd["ln_f.weight"], dtype),
        "ln_f_bias": _np(sd["ln_f.bias"], dtype),
    }
    return params


def clip_vision_params_from_hf(state_dict: Mapping[str, Any], cfg,
                               dtype: Any = np.float32) -> Params:
    """Convert a HF CLIPVisionModelWithProjection (or the vision tower of
    CLIPModel) state_dict to our pytree (see models/clip_vit.py)."""
    sd = {
        k.removeprefix("vision_model."): v
        for k, v in state_dict.items()
    }
    n = cfg.num_layers
    blocks = {}
    for ours, theirs, transpose in [
        ("ln1_scale", "encoder.layers.{}.layer_norm1.weight", False),
        ("ln1_bias", "encoder.layers.{}.layer_norm1.bias", False),
        ("q", "encoder.layers.{}.self_attn.q_proj.weight", True),
        ("q_bias", "encoder.layers.{}.self_attn.q_proj.bias", False),
        ("k", "encoder.layers.{}.self_attn.k_proj.weight", True),
        ("k_bias", "encoder.layers.{}.self_attn.k_proj.bias", False),
        ("v", "encoder.layers.{}.self_attn.v_proj.weight", True),
        ("v_bias", "encoder.layers.{}.self_attn.v_proj.bias", False),
        ("o", "encoder.layers.{}.self_attn.out_proj.weight", True),
        ("o_bias", "encoder.layers.{}.self_attn.out_proj.bias", False),
        ("ln2_scale", "encoder.layers.{}.layer_norm2.weight", False),
        ("ln2_bias", "encoder.layers.{}.layer_norm2.bias", False),
        ("mlp_fc", "encoder.layers.{}.mlp.fc1.weight", True),
        ("mlp_fc_bias", "encoder.layers.{}.mlp.fc1.bias", False),
        ("mlp_proj", "encoder.layers.{}.mlp.fc2.weight", True),
        ("mlp_proj_bias", "encoder.layers.{}.mlp.fc2.bias", False),
    ]:
        blocks[ours] = _stack(sd, theirs, n, transpose=transpose, dtype=dtype)

    params: Params = {
        "class_embedding": _np(sd["embeddings.class_embedding"], dtype),
        "patch_embedding": np.transpose(
            _np(sd["embeddings.patch_embedding.weight"], dtype), (2, 3, 1, 0)
        ),  # torch OIHW -> HWIO
        "position_embedding": _np(
            sd["embeddings.position_embedding.weight"], dtype
        ),
        "pre_ln_scale": _np(sd["pre_layrnorm.weight"], dtype),
        "pre_ln_bias": _np(sd["pre_layrnorm.bias"], dtype),
        "blocks": blocks,
        "post_ln_scale": _np(sd["post_layernorm.weight"], dtype),
        "post_ln_bias": _np(sd["post_layernorm.bias"], dtype),
    }
    if "visual_projection.weight" in state_dict:
        params["projection"] = _np(
            state_dict["visual_projection.weight"], dtype
        ).T
    return params


def clip_text_params_from_hf(state_dict: Mapping[str, Any], cfg,
                             dtype: Any = np.float32) -> Params:
    """Convert a HF CLIPTextModelWithProjection (or the text tower of
    CLIPModel) state_dict to our pytree (see models/clip.py)."""
    sd = {k.removeprefix("text_model."): v for k, v in state_dict.items()}
    n = cfg.num_layers
    blocks = {}
    for ours, theirs, transpose in [
        ("ln1_scale", "encoder.layers.{}.layer_norm1.weight", False),
        ("ln1_bias", "encoder.layers.{}.layer_norm1.bias", False),
        ("q", "encoder.layers.{}.self_attn.q_proj.weight", True),
        ("q_bias", "encoder.layers.{}.self_attn.q_proj.bias", False),
        ("k", "encoder.layers.{}.self_attn.k_proj.weight", True),
        ("k_bias", "encoder.layers.{}.self_attn.k_proj.bias", False),
        ("v", "encoder.layers.{}.self_attn.v_proj.weight", True),
        ("v_bias", "encoder.layers.{}.self_attn.v_proj.bias", False),
        ("o", "encoder.layers.{}.self_attn.out_proj.weight", True),
        ("o_bias", "encoder.layers.{}.self_attn.out_proj.bias", False),
        ("ln2_scale", "encoder.layers.{}.layer_norm2.weight", False),
        ("ln2_bias", "encoder.layers.{}.layer_norm2.bias", False),
        ("mlp_fc", "encoder.layers.{}.mlp.fc1.weight", True),
        ("mlp_fc_bias", "encoder.layers.{}.mlp.fc1.bias", False),
        ("mlp_proj", "encoder.layers.{}.mlp.fc2.weight", True),
        ("mlp_proj_bias", "encoder.layers.{}.mlp.fc2.bias", False),
    ]:
        blocks[ours] = _stack(sd, theirs, n, transpose=transpose, dtype=dtype)

    params: Params = {
        "token_embedding": _np(sd["embeddings.token_embedding.weight"], dtype),
        "position_embedding": _np(
            sd["embeddings.position_embedding.weight"], dtype
        ),
        "blocks": blocks,
        "final_ln_scale": _np(sd["final_layer_norm.weight"], dtype),
        "final_ln_bias": _np(sd["final_layer_norm.bias"], dtype),
    }
    if "text_projection.weight" in state_dict:
        params["projection"] = _np(
            state_dict["text_projection.weight"], dtype
        ).T
    return params


def mapper_params_from_reference_ckpt(state_dict: Mapping[str, Any],
                                      mapping_type: str,
                                      dtype: Any = np.float32) -> Params:
    """Convert a reference (PyTorch-Lightning) checkpoint's trained
    mapping-network weights to our mapper pytree.

    The reference checkpoint stores the full LightningModule state dict
    with a ``model.`` prefix (its caption notebook strips ``key[6:]``);
    only ``clip_project.*`` is trainable, so that is all we convert.
    Layouts (reference: src/models/vct0.py):
      * MLP: ``clip_project.model.{0,2}.{weight,bias}`` — torch Linear
        (out, in), transposed to our (in, out)
      * Transformer: ``clip_project.linear``, ``clip_project.prefix_const``
        and 8 ``clip_project.transformer.layers.{i}`` blocks
        (attn.to_queries / to_keys_values / project, mlp.fc1/fc2,
        norm1/norm2)
    """
    sd = {}
    for key, value in state_dict.items():
        key = key.removeprefix("model.")
        if key.startswith("clip_project."):
            sd[key.removeprefix("clip_project.")] = value
    if not sd:
        raise ValueError("no clip_project.* weights found in checkpoint")

    def linear(prefix: str, bias_optional: bool = False) -> Params:
        out: Params = {"w": _np(sd[f"{prefix}.weight"], dtype).T}
        if f"{prefix}.bias" in sd:
            out["b"] = _np(sd[f"{prefix}.bias"], dtype)
        elif bias_optional:
            out["b"] = np.zeros(out["w"].shape[-1], dtype=dtype)
        else:
            raise KeyError(f"{prefix}.bias")
        return out

    if mapping_type == "mlp":
        return {"fc1": linear("model.0"), "fc2": linear("model.2")}

    if mapping_type == "transformer":
        n_layers = 0
        while f"transformer.layers.{n_layers}.norm1.weight" in sd:
            n_layers += 1
        blocks = []
        for i in range(n_layers):
            base = f"transformer.layers.{i}"
            blocks.append({
                "ln1_scale": _np(sd[f"{base}.norm1.weight"], dtype),
                "ln1_bias": _np(sd[f"{base}.norm1.bias"], dtype),
                "q": linear(f"{base}.attn.to_queries", bias_optional=True),
                "kv": linear(f"{base}.attn.to_keys_values",
                             bias_optional=True),
                "o": linear(f"{base}.attn.project"),
                "ln2_scale": _np(sd[f"{base}.norm2.weight"], dtype),
                "ln2_bias": _np(sd[f"{base}.norm2.bias"], dtype),
                "mlp": {
                    "fc1": linear(f"{base}.mlp.fc1"),
                    "fc2": linear(f"{base}.mlp.fc2"),
                },
            })
        import jax

        stacked = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
        return {
            "linear": linear("linear"),
            "prefix_const": _np(sd["prefix_const"], dtype),
            "blocks": stacked,
        }

    raise ValueError(
        f"unsupported mapping_type for conversion: {mapping_type}"
    )
