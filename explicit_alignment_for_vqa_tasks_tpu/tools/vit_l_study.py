"""ViT-L/14@336 per-op accounting + long-seq variant shootout (r3 #6).

Round 2 left ViT-L at 372 img/s = 74.6% of the 190.6 TFLOP/s ceiling
with only a one-line hypothesis for the missing 13 points. This tool
produces decode-grade evidence on the chip:

  1. component towers — 24-layer stacks of ONLY the attention half /
     ONLY the MLP half / ONLY the projections, timed with the amortized
     (K encodes per fetch) methodology, so each op's share of the layer
     is measured, not guessed;
  2. end-to-end variants — the round-2 split path vs the three round-3
     candidates ("whole" block in one program, "whole_dd" with deferred
     softmax division, "split3" fused LN+QKV / core+oproj / MLP);
  3. the analytic FLOP split, so every measured time converts to a
     %-of-ceiling figure.

Run (raises the scoped-VMEM budget itself; must be the only TPU proc):
    python -m explicit_alignment_for_vqa_tasks_tpu.tools.vit_l_study
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from ..utils.tpu_flags import ensure_scoped_vmem_limit

    ensure_scoped_vmem_limit(98304)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models.clip import (
        CLIPVisionConfig,
        clip_encode_image,
        init_clip_vision_params,
    )
    from ..utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    B, K, TRIALS = 128, 16, 3
    base = CLIPVisionConfig.vit_l_14_336(dtype=jnp.bfloat16,
                                         fast_attention=True,
                                         fused_attention=True,
                                         fused_block=True)
    L, D, H, FF = base.seq_len, base.width, base.num_heads, 4 * base.width
    params = init_clip_vision_params(jax.random.PRNGKey(0), base,
                                     jnp.bfloat16)

    def timed(fn, *args) -> float:
        """Best seconds per ONE inner iteration over TRIALS fetches."""
        float(fn(*args))  # compile + warmup; fetch forces execution
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best / K

    # ---------------- end-to-end variants ----------------
    @jax.jit
    def gen(key):
        return jax.random.normal(
            key, (K, B, base.image_size, base.image_size, 3),
            dtype=jnp.bfloat16,
        )

    stacked = gen(jax.random.PRNGKey(1))

    def encoder_for(cfg):
        @jax.jit
        def run(params, stacked):
            def body(carry, images):
                emb = clip_encode_image(params, cfg, images)
                return carry + jnp.sum(emb.astype(jnp.float32)), None

            total, _ = jax.lax.scan(body, jnp.float32(0), stacked)
            return total

        return run

    variants = {
        "xla": dataclasses.replace(base, fused_attention=False,
                                   fused_block=False),
        "split_r2": dataclasses.replace(base, fused_block_long="split"),
        "whole": dataclasses.replace(base, fused_block_long="whole"),
        "whole_dd": dataclasses.replace(base, fused_block_long="whole_dd"),
        "split3": dataclasses.replace(base, fused_block_long="split3"),
        "split_c2": dataclasses.replace(base, fused_block_long="split_c2"),
        "split_fe": dataclasses.replace(base, fused_block_long="split_fe"),
        "split_c2fe": dataclasses.replace(base,
                                          fused_block_long="split_c2fe"),
    }
    results = {}
    for name, cfg in variants.items():
        try:
            dt = timed(encoder_for(cfg), params, stacked)
            results[name] = {
                "images_per_s": round(B / dt, 1),
                "ms_per_batch128": round(dt * 1e3, 2),
            }
            print(f"{name:>10}: {B / dt:8.1f} img/s", file=sys.stderr)
        except Exception as exc:
            results[name] = {"error": str(exc)[:300]}
            print(f"{name:>10}: FAILED {str(exc)[:120]}", file=sys.stderr)

    # ---------------- component towers (24-layer stacks) ----------------
    from ..models.clip import _layer_norm
    from ..ops.fused_attention_block import (
        attention_core,
        attention_core_oproj,
        fused_ln_qkv,
        fused_mlp_block,
    )

    blocks = params["blocks"]
    x0 = jax.jit(lambda key: jax.random.normal(key, (B, L, D),
                                               dtype=jnp.bfloat16))(
        jax.random.PRNGKey(2)
    )
    head_dim = D // H
    eps = base.layer_norm_epsilon

    def tower(layer_fn):
        @jax.jit
        def run(blocks, x):
            def outer(carry, _):
                def body(c, lp):
                    return layer_fn(c, lp), None

                y, _ = jax.lax.scan(body, carry, blocks)
                return y, None

            y, _ = jax.lax.scan(outer, x, None, length=K)
            return jnp.sum(y.astype(jnp.float32))

        return run

    dt_bf = jnp.bfloat16

    def attn_half_split(x, lp):
        # round-2 split formulation: XLA LN+QKV+o-proj, fused core
        ln1 = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
        q = (jnp.einsum("bld,de->ble", ln1, lp["q"].astype(dt_bf),
                        preferred_element_type=jnp.float32).astype(dt_bf)
             + lp["q_bias"].astype(dt_bf))
        k = (jnp.einsum("bld,de->ble", ln1, lp["k"].astype(dt_bf),
                        preferred_element_type=jnp.float32).astype(dt_bf)
             + lp["k_bias"].astype(dt_bf))
        v = (jnp.einsum("bld,de->ble", ln1, lp["v"].astype(dt_bf),
                        preferred_element_type=jnp.float32).astype(dt_bf)
             + lp["v_bias"].astype(dt_bf))
        attn = attention_core(q * (head_dim ** -0.5), k, v, H, group=1)
        out = jnp.einsum("ble,ed->bld", attn, lp["o"].astype(dt_bf),
                         preferred_element_type=jnp.float32).astype(dt_bf)
        return x + out + lp["o_bias"].astype(dt_bf)

    def attn_half_split3(x, lp):
        q, k, v = fused_ln_qkv(
            x, lp["ln1_scale"], lp["ln1_bias"], lp["q"], lp["q_bias"],
            lp["k"], lp["k_bias"], lp["v"], lp["v_bias"],
            scale=head_dim ** -0.5, group=1, eps=eps,
        )
        return attention_core_oproj(x, q, k, v, lp["o"], lp["o_bias"],
                                    num_heads=H, group=1)

    def qkv_only(x, lp):
        ln1 = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
        q = jnp.einsum("bld,de->ble", ln1, lp["q"].astype(dt_bf),
                       preferred_element_type=jnp.float32).astype(dt_bf)
        k = jnp.einsum("bld,de->ble", ln1, lp["k"].astype(dt_bf),
                       preferred_element_type=jnp.float32).astype(dt_bf)
        v = jnp.einsum("bld,de->ble", ln1, lp["v"].astype(dt_bf),
                       preferred_element_type=jnp.float32).astype(dt_bf)
        return (q + k + v).astype(dt_bf)  # keep all three live

    def core_only(x, lp):
        attn = attention_core(x * (head_dim ** -0.5), x, x, H, group=1)
        return attn.astype(dt_bf)

    def mlp_only(x, lp):
        return fused_mlp_block(
            x, lp["ln2_scale"], lp["ln2_bias"], lp["mlp_fc"],
            lp["mlp_fc_bias"], lp["mlp_proj"], lp["mlp_proj_bias"],
            group=1, eps=eps,
        )

    def mlp_chunked(n):
        def fn(x, lp):
            return fused_mlp_block(
                x, lp["ln2_scale"], lp["ln2_bias"], lp["mlp_fc"],
                lp["mlp_fc_bias"], lp["mlp_proj"], lp["mlp_proj_bias"],
                group=1, eps=eps, chunks=n,
            )

        return fn

    def core_fast_exp(x, lp):
        attn = attention_core(x * (head_dim ** -0.5), x, x, H, group=1,
                              fast_exp=True)
        return attn.astype(dt_bf)

    towers = {
        "attn_half_split_r2": attn_half_split,
        "attn_half_split3": attn_half_split3,
        "qkv_projections_xla": qkv_only,
        "attention_core_only": core_only,
        "attention_core_fast_exp": core_fast_exp,
        "mlp_fused_only": mlp_only,
        "mlp_fused_chunks2": mlp_chunked(2),
        "mlp_fused_chunks4": mlp_chunked(4),
    }
    accounting = {}
    for name, fn in towers.items():
        try:
            dt = timed(tower(fn), blocks, x0)
            accounting[name] = {
                "ms_per_batch128": round(dt * 1e3, 2),
                "ms_per_image_24layers": round(dt * 1e3 / B, 4),
            }
            print(f"{name:>22}: {dt * 1e3:8.2f} ms/batch",
                  file=sys.stderr)
        except Exception as exc:
            accounting[name] = {"error": str(exc)[:300]}
            print(f"{name:>22}: FAILED {str(exc)[:120]}", file=sys.stderr)

    # ---------------- analytic FLOP split ----------------
    per_layer = {
        "qkv": 3 * 2 * L * D * D,
        "scores_pv": 2 * 2 * L * L * D,
        "o_proj": 2 * L * D * D,
        "mlp": 2 * 2 * L * D * FF,
    }
    total = sum(per_layer.values())
    flops = {k: {"gflop_per_image_per_layer": round(v / 1e9, 3),
                 "pct_of_layer": round(100 * v / total, 1)}
             for k, v in per_layer.items()}

    print(json.dumps({
        "metric": "vit_l_336_study",
        "batch": B, "k_batches": K,
        "variants": results,
        "component_towers_24layer": accounting,
        "flop_split_per_layer": flops,
        "ceiling_tflops": 190.6,
    }))


if __name__ == "__main__":
    main()
