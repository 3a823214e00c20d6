"""Secondary benchmark: T0-3B-architecture ENCODER throughput (B=32,
557 tokens — the flagship few-shot prompt shape).

A/B's the encoder kernel variants; not part of the driver's bench.py
contract. Run manually: python bench_encoder.py

Measured (v5e, 2026-08-17, amortized 8 encodes/fetch, carry-dependent
scan body so XLA cannot hoist the encode):
  XLA attention             359.6 ms/encode  120 TFLOP/s
  fused Pallas attention    260.7 ms/encode  166 TFLOP/s (87% MFU) <- default
  + fused Pallas FFN        272.2 ms/encode  159 TFLOP/s (NEGATIVE -4%:
      XLA's own FFN fusion at d_ff=5120/17.8k rows is already excellent;
      the kernel's in-program RMS-norm/gelu serialize against the MXU.
      fused_t5_ffn stays available behind tpu.fused_ffn, default OFF.)
Opt-in int8 modes (v5e, 2026-08-18, same methodology):
  fused attn + int8 FFN     204.8 ms/encode  211 TFLOP/s-equiv
  + int8 qkv/o projections  170.2 ms/encode  254 TFLOP/s-equiv (1.53x bf16)
  per-channel scales (G=1)  170.6 ms/encode  (grouping G=8 is FREE ->
      the drift-reducing grouped quantizers stay the default)
"""
import dataclasses
import time

from explicit_alignment_for_vqa_tasks_tpu.utils.tpu_flags import (
    ensure_scoped_vmem_limit,
)

# the fused-FFN variant holds all three FFN matrices in VMEM (~63 MB)
ensure_scoped_vmem_limit(98304)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from explicit_alignment_for_vqa_tasks_tpu.models.t5 import (  # noqa: E402
    T5Config,
    embed_tokens,
    init_t5_params,
    quantize_encoder_attn,
    quantize_encoder_ffn,
    t5_encode,
)
from explicit_alignment_for_vqa_tasks_tpu.utils.compilation_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

B, L = 32, 557
REPS = 8


def main() -> None:
    base_cfg = T5Config.t0_3b(dtype=jnp.bfloat16,
                              fused_encoder_attention=True)
    params = init_t5_params(jax.random.PRNGKey(0), base_cfg, jnp.bfloat16)
    enc_params = {"shared": params["shared"], "encoder": params["encoder"]}
    ids = jax.jit(
        lambda k: jax.random.randint(k, (B, L), 0, 30000)
    )(jax.random.PRNGKey(1))

    def bench(cfg, name, bench_params=None):
        bench_params = bench_params or enc_params

        @jax.jit
        def run(p, ids):
            emb = embed_tokens(p, cfg, ids)

            def body(c, _):
                # carry-dependent input defeats loop-invariant hoisting
                h = t5_encode(p, cfg, inputs_embeds=emb * (1.0 + c * 1e-12))
                return jnp.sum(h.astype(jnp.float32)) * 1e-9, None

            t, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return t

        float(run(bench_params, ids))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(bench_params, ids))
            best = min(best, (time.perf_counter() - t0) / REPS)
        d, ff = cfg.d_model, cfg.d_ff
        flops = cfg.num_encoder_layers * B * L * (
            4 * 2 * d * d + 3 * 2 * d * ff + 2 * 2 * L * d
        )
        print(f"{name}: {1e3*best:.1f} ms/encode (B={B}) "
              f"{flops/best/1e12:.0f} TFLOP/s  {B/best:.0f} prompts-enc/s",
              flush=True)

    bench(base_cfg, "fused attn (default)")
    bench(dataclasses.replace(base_cfg, fused_encoder_ffn=True),
          "fused attn + fused ffn")
    bench(dataclasses.replace(base_cfg, fused_encoder_attention=False),
          "XLA attn")
    # round-3 opt-in bulk-eval mode: all FFN matmuls int8 on the MXU
    q_params = quantize_encoder_ffn(enc_params)
    bench(dataclasses.replace(base_cfg, int8_encoder_ffn=True),
          "fused attn + int8 ffn (opt-in)", bench_params=q_params)
    # + int8 QKV/O projections around the bf16 attention core
    qa_params = quantize_encoder_attn(q_params)
    bench(dataclasses.replace(base_cfg, int8_encoder_ffn=True,
                              int8_encoder_attn=True),
          "int8 ffn + int8 qkv/o (opt-in)", bench_params=qa_params)
    # contraction-grouping cost check: the default quantizers emit 8
    # groups (drift reduction, PARITY.md); per-channel = 1 group is the
    # round-3 initial scheme. Grouping must be ~free to stay the default.
    qa1_params = quantize_encoder_attn(
        quantize_encoder_ffn(enc_params, groups=1), groups=1)
    bench(dataclasses.replace(base_cfg, int8_encoder_ffn=True,
                              int8_encoder_attn=True),
          "int8 full, per-channel scales (groups=1)",
          bench_params=qa1_params)


if __name__ == "__main__":
    main()
