"""Host data pipeline must outrun device demand at CC-training shapes.

Round-1 review finding: no throughput evidence pinned host collate
(tokenization) >= the device's examples/sec. The bound here is the
MEASURED device consumption rate, not a FLOP-model estimate: round-2
bench_train.py measured the VC-T0 captioning train step consuming
328.6 examples/s/chip on the v5e at exactly these CC shapes (fused
encoder attention, B=32; see PARITY.md "Performance" — consistent with
the honest 190.6 TFLOP/s chip ceiling). The host pipeline (real subword
tokenization + numpy assembly via the thread-pool BatchIterator) must
sustain >= 1.5x that per chip — measured here with the committed REAL
tokenizer fixture on CC-shaped captions.
"""

import time

import numpy as np
import pytest

from explicit_alignment_for_vqa_tasks_tpu.data.loader import (
    BatchIterator,
    ListDataset,
)

# The device's MEASURED CC-training consumption rate per chip
# (bench_train.py round 2 on v5e: 328.6 examples/s at these shapes).
DEVICE_DEMAND_PER_CHIP = 328.6
REQUIRED_HEADROOM = 1.5

CAPTIONS = [
    "a picture of a dog playing with a red ball in the park",
    "two cats sleeping on a sofa next to the window",
    "a man riding a bicycle down a busy city street at night",
    "a plate of food with rice vegetables and grilled chicken",
    "children playing football on a green field near the school",
]


@pytest.mark.slow
def test_host_collate_outruns_device_demand():
    import os

    from explicit_alignment_for_vqa_tasks_tpu.data.tokenization import (
        load_tokenizer,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tokenizer = load_tokenizer(
        "T5TokenizerFast",
        os.path.join(repo, "tests", "fixtures", "tiny_t5_tokenizer"),
    )

    n, batch = 4096, 64
    rng = np.random.default_rng(0)
    items = [
        {
            "caption": CAPTIONS[i % len(CAPTIONS)],
            "clip_embedding": rng.standard_normal(768).astype(np.float32),
        }
        for i in range(n)
    ]

    def collate(samples):
        # CC collate shape: tokenize captions (pad->-100 labels) + stack
        # embeddings (reference: data_loader_conceptual_captions.py:78-104)
        enc = tokenizer(
            [s["caption"] for s in samples],
            padding="max_length", max_length=32, truncation=True,
            return_tensors="np",
        )
        labels = np.asarray(enc["input_ids"], dtype=np.int32)
        labels[np.asarray(enc["attention_mask"]) == 0] = -100
        return {
            "labels": labels,
            "clip_embeddings": np.stack(
                [s["clip_embedding"] for s in samples]
            ),
        }

    it = BatchIterator(
        ListDataset(items), batch_size=batch, collate_fn=collate,
        num_workers=4,
    )
    # warmup (pool spin-up, tokenizer caches)
    next(iter(it))

    t0 = time.perf_counter()
    n_examples = 0
    for b in it:
        n_examples += b["labels"].shape[0]
    dt = time.perf_counter() - t0
    throughput = n_examples / dt

    required = REQUIRED_HEADROOM * DEVICE_DEMAND_PER_CHIP
    assert throughput >= required, (
        f"host pipeline {throughput:.0f} ex/s < required "
        f"{required:.0f} ex/s (1.5x device demand)"
    )
    print(f"host pipeline: {throughput:.0f} ex/s "
          f"({throughput / DEVICE_DEMAND_PER_CHIP:.1f}x device demand; "
          f"supports ~{throughput / DEVICE_DEMAND_PER_CHIP:.0f} chips)")
