"""ViT-B/32@224 per-op accounting + variant shootout (VERDICT r3 #2).

ViT-B/32 is the PRIMARY BENCH.json metric and sat at 68.6% of the
190.6 TFLOP/s ceiling with only a one-paragraph hypothesis (VPU-serial
chain + block-diag overhead), while ViT-L earned `vit_l_study.py` —
which found 4% and shipped a better default. This is the same
decode-grade treatment at ViT-B shapes (seq 50, head_dim 64, d_ff 3072):

  1. end-to-end variants — the shipped whole-block kernel across group
     sizes, the split3 recipe that beat whole-block on ViT-L (newly
     selectable at short seq via fused_block_long="split3"), and plain
     XLA;
  2. component towers — 12-layer stacks of ONLY the qkv projections /
     attention core / MLP / whole block, timed with the amortized
     (K encodes per fetch) methodology;
  3. the analytic FLOP split, so every measured time converts to a
     %-of-ceiling figure.

Reference surface: the op the 5k img/s target measures is the
reference's one-image-at-a-time CLIP extractor
(/root/reference/src/tools/extract_contrastive_image_embeddings.py:58-65).

Run (must be the only TPU process):
    python -m explicit_alignment_for_vqa_tasks_tpu.tools.vit_b_study
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import argparse
    import dataclasses

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--variants", type=str, default="",
                        help="comma filter of end-to-end variants to run "
                        "(each compiles ~60-90s on the relay; chunk runs "
                        "to stay under process timeouts)")
    parser.add_argument("--towers", type=str, default="",
                        help="comma filter of component towers; 'none' "
                        "skips them")
    cli = parser.parse_args()
    import jax.numpy as jnp

    from ..models.clip import (
        CLIPVisionConfig,
        _layer_norm,
        clip_encode_image,
        init_clip_vision_params,
    )
    from ..utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    B, K, TRIALS = 1024, 16, 3
    base = CLIPVisionConfig.vit_b_32(dtype=jnp.bfloat16,
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
        "fused_attention_only": dataclasses.replace(base,
                                                    fused_block=False),
        "whole_g1": dataclasses.replace(base, fused_block_group=1),
        "whole_g2": dataclasses.replace(base, fused_block_group=2),
        "whole_g4_shipped": dataclasses.replace(base, fused_block_group=4),
        "whole_g8": dataclasses.replace(base, fused_block_group=8),
        "whole_g16": dataclasses.replace(base, fused_block_group=16),
        "whole_g4_fe": dataclasses.replace(base, fused_block_group=4,
                                           fused_block_long="whole_fe"),
        "whole_g8_fe": dataclasses.replace(base, fused_block_group=8,
                                           fused_block_long="whole_fe"),
        "split3_g4": dataclasses.replace(base, fused_block_long="split3",
                                         fused_block_group=4),
        "split3_g8": dataclasses.replace(base, fused_block_long="split3",
                                         fused_block_group=8),
        "split3_g16": dataclasses.replace(base, fused_block_long="split3",
                                          fused_block_group=16),
        "split3_g32": dataclasses.replace(base, fused_block_long="split3",
                                          fused_block_group=32),
    }
    if cli.variants:
        want = {v for v in cli.variants.split(",") if v}
        variants = {k: v for k, v in variants.items() if k in want}
    results = {}
    for name, cfg in variants.items():
        try:
            dt = timed(encoder_for(cfg), params, stacked)
            results[name] = {
                "images_per_s": round(B / dt, 1),
                "ms_per_batch1024": round(dt * 1e3, 2),
            }
            print(f"{name:>22}: {B / dt:8.1f} img/s", file=sys.stderr)
        except Exception as exc:
            results[name] = {"error": str(exc)[:300]}
            print(f"{name:>22}: FAILED {str(exc)[:120]}", file=sys.stderr)

    # ---------------- component towers (12-layer stacks) ----------------
    from ..ops.fused_attention_block import (
        attention_core,
        attention_core_oproj,
        fused_ln_qkv,
        fused_mlp_block,
        fused_vit_block,
    )

    blocks = params["blocks"]
    x0 = jax.jit(lambda key: jax.random.normal(key, (B, L, D),
                                               dtype=jnp.bfloat16))(
        jax.random.PRNGKey(2)
    )
    head_dim = D // H
    eps = base.layer_norm_epsilon
    dt_bf = jnp.bfloat16

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

    def whole_block(g):
        def fn(x, lp):
            return fused_vit_block(
                x, lp["ln1_scale"], lp["ln1_bias"],
                lp["q"], lp["q_bias"], lp["k"], lp["k_bias"],
                lp["v"], lp["v_bias"], lp["o"], lp["o_bias"],
                lp["ln2_scale"], lp["ln2_bias"],
                lp["mlp_fc"], lp["mlp_fc_bias"],
                lp["mlp_proj"], lp["mlp_proj_bias"],
                num_heads=H, group=g, eps=eps,
            )

        return fn

    def qkv_only(x, lp):
        ln1 = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
        q = jnp.einsum("bld,de->ble", ln1, lp["q"].astype(dt_bf),
                       preferred_element_type=jnp.float32).astype(dt_bf)
        k = jnp.einsum("bld,de->ble", ln1, lp["k"].astype(dt_bf),
                       preferred_element_type=jnp.float32).astype(dt_bf)
        v = jnp.einsum("bld,de->ble", ln1, lp["v"].astype(dt_bf),
                       preferred_element_type=jnp.float32).astype(dt_bf)
        return (q + k + v).astype(dt_bf)  # keep all three live

    def ln_qkv_fused(g):
        def fn(x, lp):
            q, k, v = fused_ln_qkv(
                x, lp["ln1_scale"], lp["ln1_bias"], lp["q"], lp["q_bias"],
                lp["k"], lp["k_bias"], lp["v"], lp["v_bias"],
                scale=head_dim ** -0.5, group=g, eps=eps,
            )
            return (q + k + v).astype(dt_bf)

        return fn

    def core_only(g):
        def fn(x, lp):
            attn = attention_core(x * (head_dim ** -0.5), x, x, H, group=g)
            return attn.astype(dt_bf)

        return fn

    def core_oproj_only(g):
        def fn(x, lp):
            return attention_core_oproj(
                x, x * (head_dim ** -0.5), x, x, lp["o"], lp["o_bias"],
                num_heads=H, group=g,
            )

        return fn

    def mlp_only(g):
        def fn(x, lp):
            return fused_mlp_block(
                x, lp["ln2_scale"], lp["ln2_bias"], lp["mlp_fc"],
                lp["mlp_fc_bias"], lp["mlp_proj"], lp["mlp_proj_bias"],
                group=g, eps=eps,
            )

        return fn

    towers = {
        "whole_block_g4": whole_block(4),
        "whole_block_g8": whole_block(8),
        "qkv_projections_xla": qkv_only,
        "ln_qkv_fused_g8": ln_qkv_fused(8),
        "attention_core_g4": core_only(4),
        "attention_core_g8": core_only(8),
        "core_oproj_g8": core_oproj_only(8),
        "mlp_fused_g4": mlp_only(4),
        "mlp_fused_g8": mlp_only(8),
        "mlp_fused_g16": mlp_only(16),
    }
    if cli.towers == "none":
        towers = {}
    elif cli.towers:
        want = {v for v in cli.towers.split(",") if v}
        towers = {k: v for k, v in towers.items() if k in want}
    accounting = {}
    for name, fn in towers.items():
        try:
            dt = timed(tower(fn), blocks, x0)
            accounting[name] = {
                "ms_per_batch1024": round(dt * 1e3, 3),
                "us_per_image_12layers": round(dt * 1e6 / B, 3),
            }
            print(f"{name:>22}: {dt * 1e3:8.3f} ms/batch",
                  file=sys.stderr)
        except Exception as exc:
            accounting[name] = {"error": str(exc)[:300]}
            print(f"{name:>22}: FAILED {str(exc)[:120]}", file=sys.stderr)

    # patch-embed + final LN/proj overhead: the encoder minus the blocks
    if not cli.towers or "patch_embed_only" in cli.towers:
        @jax.jit
        def embed_only(params, stacked):
            from ..models.clip import patch_embed

            def body(carry, images):
                x = patch_embed(params, base, images)
                return carry + jnp.sum(x.astype(jnp.float32)), None

            total, _ = jax.lax.scan(body, jnp.float32(0), stacked)
            return total

        dt = timed(embed_only, params, stacked)
        accounting["patch_embed_only"] = {
            "ms_per_batch1024": round(dt * 1e3, 3),
            "us_per_image": round(dt * 1e6 / B, 3),
        }
        print(f"{'patch_embed_only':>22}: {dt * 1e3:8.3f} ms/batch",
              file=sys.stderr)

    # ---------------- analytic FLOP split ----------------
    per_layer = {
        "qkv": 3 * 2 * L * D * D,
        "scores_pv": 2 * 2 * L * L * D,
        "o_proj": 2 * L * D * D,
        "mlp": 2 * 2 * L * D * FF,
    }
    total = sum(per_layer.values())
    flops = {k: {"mflop_per_image_per_layer": round(v / 1e6, 1),
                 "pct_of_layer": round(100 * v / total, 1)}
             for k, v in per_layer.items()}

    print(json.dumps({
        "metric": "vit_b_32_study",
        "batch": B, "k_batches": K,
        "variants": results,
        "component_towers_12layer": accounting,
        "flop_split_per_layer": flops,
        "ceiling_tflops": 190.6,
    }))


if __name__ == "__main__":
    main()
