"""Build models from the config-file schema.

The reference instantiates model classes by name from
``config.model_config.ModelClass`` with ``model_args``
(reference: src/trainers/few_shot_vqa_executor.py:59-60) and loads
pretrained HF weights by version string. Here the LM architecture comes
from ``ConfigClass``; pretrained torch weights are converted on the fly
when available locally (zero-egress safe: falls back to random init with a
warning, which is sufficient for smoke/dev runs).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.clipcap import ClipCapConfig, ClipCaptionModel, init_clipcap_params
from ..models.gpt2 import GPT2Config
from ..models.hf_convert import gpt2_params_from_hf, t5_params_from_hf
from ..models.t5 import T5Config
from ..models.vct0 import VCT0Config, VCT0Model, init_vct0_params

logger = logging.getLogger(__name__)

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}

# ConfigClass string -> base LM config factory
T5_CONFIGS = {
    "T0_3B": T5Config.t0_3b,
    "T0": T5Config.t0_3b,
    "T5_test": T5Config.small_test,
}
GPT2_CONFIGS = {
    "GPT2": GPT2Config.gpt2_small,
    "GPT2_test": GPT2Config.small_test,
}


def _compute_dtype(config: Any):
    name = config.get("tpu", {}).get("compute_dtype", "bfloat16")
    return _DTYPES[name]


def _param_dtype(config: Any):
    name = config.get("tpu", {}).get("params_dtype", "bfloat16")
    return _DTYPES[name]


def _lm_overrides(config: Any) -> Dict[str, Any]:
    """Optional dims override block (used by tests / small dev runs)."""
    return dict(config.model_config.get("lm_config", {}))


def _try_load_hf_t5(model_version: str, cfg: T5Config,
                    param_dtype) -> Optional[Dict]:
    try:
        import numpy as np
        import transformers

        model = transformers.T5ForConditionalGeneration.from_pretrained(
            model_version, local_files_only=True, torch_dtype="float32"
        )
        params = t5_params_from_hf(model.state_dict(), cfg)
        del model
        return jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), dtype=param_dtype), params
        )
    except Exception as exc:
        logger.warning(
            "could not load pretrained T5 weights %r locally (%s); using "
            "random init", model_version, exc,
        )
        return None


def _try_load_hf_gpt2(model_version: str, cfg: GPT2Config,
                      param_dtype) -> Optional[Dict]:
    try:
        import numpy as np
        import transformers

        model = transformers.GPT2LMHeadModel.from_pretrained(
            model_version, local_files_only=True
        )
        params = gpt2_params_from_hf(model.state_dict(), cfg)
        del model
        return jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), dtype=param_dtype), params
        )
    except Exception as exc:
        logger.warning(
            "could not load pretrained GPT-2 weights %r locally (%s); using "
            "random init", model_version, exc,
        )
        return None


def build_model_from_config(config: Any) -> Tuple[Any, Any]:
    """Returns (model, model_kind) where model_kind is 'vct0'/'clipcap'."""
    mc = config.model_config
    model_class = mc.ModelClass
    model_args = dict(mc.get("model_args", {}))
    compute_dtype = _compute_dtype(config)
    param_dtype = _param_dtype(config)
    seed = int(config.get("seed", 0))
    key = jax.random.PRNGKey(seed)

    if model_class in ("VCT0Prefix", "VCT0Model"):
        base = T5_CONFIGS.get(mc.get("ConfigClass", "T0_3B"), T5Config.t0_3b)
        overrides = _lm_overrides(config)
        overrides.setdefault(
            "remat", bool(config.get("tpu", {}).get("remat", False))
        )
        overrides.setdefault(
            "fused_encoder_attention",
            bool(config.get("tpu", {}).get("fused_attention", False)),
        )
        overrides.setdefault(
            "fused_encoder_ffn",
            bool(config.get("tpu", {}).get("fused_ffn", False)),
        )
        overrides.setdefault(
            "int8_cross_kv",
            bool(config.get("tpu", {}).get("int8_cross_kv", False)),
        )
        # tpu.int8_kv_layout: cross-KV cache storage layout override
        # (unmerged | merged | transposed; unset = auto by decode batch
        # — see models/t5.py T5Config.int8_kv_layout)
        if "int8_kv_layout" in config.get("tpu", {}):
            overrides.setdefault(
                "int8_kv_layout",
                str(config["tpu"]["int8_kv_layout"]),
            )
        overrides.setdefault(
            "int8_encoder_ffn",
            bool(config.get("tpu", {}).get("int8_encoder_ffn", False)),
        )
        overrides.setdefault(
            "int8_encoder_attn",
            bool(config.get("tpu", {}).get("int8_encoder_attn", False)),
        )
        overrides.setdefault(
            "int8_decoder_step",
            bool(config.get("tpu", {}).get("int8_decoder_step", False)),
        )
        lm_cfg = base(dtype=compute_dtype, **overrides)
        cfg = VCT0Config.from_model_args(
            model_args, lm_cfg=lm_cfg,
            freeze_lm=(model_class == "VCT0Prefix"),
        )
        lm_params = None
        if mc.get("pretrained") and model_args.get("model_version"):
            lm_params = _try_load_hf_t5(
                model_args["model_version"], lm_cfg, param_dtype
            )
        params = init_vct0_params(
            key, cfg, lm_params=lm_params, param_dtype=param_dtype
        )
        any_int8 = lm_cfg.int8_encoder_ffn or lm_cfg.int8_encoder_attn
        calib_batches = int(
            config.get("tpu", {}).get("int8_calibrate_batches", 0) or 0
        )
        if any_int8 and calib_batches > 0:
            # defer quantization to the executor, which calibrates
            # SmoothQuant activation maxima on the first eval batches
            # (VCT0Model.calibrate_and_quantize_int8)
            model = VCT0Model(cfg, params)
            model.pending_int8_calibration = {
                "batches": calib_batches,
                "alpha": float(
                    config.get("tpu", {}).get("int8_smooth_alpha", 0.5)
                ),
            }
            return model, "vct0"
        if lm_cfg.int8_encoder_ffn:
            # quantize the frozen LM's FFN weights once at build time
            # (opt-in bulk-eval mode; tpu.int8_encoder_ffn)
            from ..models.t5 import quantize_encoder_ffn

            params["lm"] = quantize_encoder_ffn(params["lm"])
        if lm_cfg.int8_encoder_attn:
            from ..models.t5 import quantize_encoder_attn

            params["lm"] = quantize_encoder_attn(params["lm"])
        if lm_cfg.int8_decoder_step:
            # weight-only: no activation calibration needed, quantize
            # unconditionally at build time (tpu.int8_decoder_step).
            # drop_bf16: eval-only mode — keeping the ~2.7 GB bf16
            # decoder copies resident would undo the B=64 capacity win;
            # the training loss raises loudly if it runs under this flag
            from ..models.t5 import quantize_decoder_step

            params["lm"] = quantize_decoder_step(params["lm"],
                                                 drop_bf16=True)
        return VCT0Model(cfg, params), "vct0"

    if model_class in ("ClipCaptionPrefix", "ClipCaptionModel"):
        base = GPT2_CONFIGS.get(mc.get("ConfigClass", "GPT2"),
                                GPT2Config.gpt2_small)
        overrides = _lm_overrides(config)
        overrides.setdefault(
            "fused_block",
            bool(config.get("tpu", {}).get("fused_attention", False)),
        )
        lm_cfg = base(dtype=compute_dtype, **overrides)
        cfg = ClipCapConfig.from_model_args(
            model_args, lm_cfg=lm_cfg,
            freeze_lm=(model_class == "ClipCaptionPrefix"),
        )
        lm_params = None
        if mc.get("pretrained") and model_args.get("model_version"):
            lm_params = _try_load_hf_gpt2(
                model_args["model_version"], lm_cfg, param_dtype
            )
        params = init_clipcap_params(
            key, cfg, lm_params=lm_params, param_dtype=param_dtype
        )
        return ClipCaptionModel(cfg, params), "clipcap"

    raise ValueError(f"unknown ModelClass: {model_class}")
