"""Train + save the tiny committed T5-style tokenizer fixture.

The reference runs a real sentencepiece T0 tokenizer
(reference: src/data_loader_manager/data_loader_wrapper.py:43-62); the
round-1 build only ever exercised the whitespace SimpleTokenizer. This
script trains a REAL subword tokenizer (HF `tokenizers` Unigram — the same
model family and Metaspace/byte semantics as T5's sentencepiece) on a tiny
VQA-flavoured corpus and saves it in T5TokenizerFast layout:

  * pad=0 (<pad>), eos=1 (</s>), unk=2 (<unk>)
  * `</s>` appended by the post-processor (T5 convention)
  * 100 `<extra_id_i>` sentinels appended at the TOP of the id space in
    DESCENDING order — `<extra_id_0>` is the highest id, `<extra_id_i>`
    = base - i — matching the real T5 vocabulary layout the prefix-splice
    op keys on (reference: src/models/vct0.py:506-509).

Deterministic: regenerating from the same corpus reproduces the files.
Output: tests/fixtures/tiny_t5_tokenizer/ (committed).
"""

from __future__ import annotations

import json
import os

VOCAB_SIZE = 512          # trained pieces incl. pad/eos/unk
NUM_EXTRA_IDS = 100       # sentinels; total vocab = VOCAB_SIZE + 100

CORPUS = [
    "What color is the cat?",
    "What color is the dog?",
    "How many people are in the picture?",
    "Is the man wearing a hat?",
    "What is on the table next to the plate?",
    "Combine facts and answer this question.",
    "A picture of a dog playing in the park.",
    "A picture of two cats sleeping on a red sofa.",
    "The answer is yes.",
    "The answer is no.",
    "one two three four five six seven eight nine ten",
    "red blue green yellow black white brown orange",
    "Please answer the question about the image.",
    "What is the weather like today in the city?",
    "Is this a question about sports or food?",
    "banana apple pizza sandwich table chair window door",
    "the a an is are was were on in at of to and or",
    "yes no maybe left right up down big small",
    "What sport is being played on the field?",
    "What kind of animal is shown in the photo?",
] * 5


def build_tokenizer():
    from tokenizers import Regex, Tokenizer, decoders, pre_tokenizers
    from tokenizers.models import Unigram
    from tokenizers.normalizers import Precompiled, Replace, Sequence
    from tokenizers.processors import TemplateProcessing
    from tokenizers.trainers import UnigramTrainer

    tok = Tokenizer(Unigram())
    # T5's sentencepiece normalizer collapses whitespace; Metaspace adds
    # the ▁ word-boundary marker exactly like sentencepiece
    tok.normalizer = Sequence([Replace(Regex(r" {2,}"), " ")])
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    trainer = UnigramTrainer(
        vocab_size=VOCAB_SIZE,
        special_tokens=["<pad>", "</s>", "<unk>"],
        unk_token="<unk>",
        shrinking_factor=0.75,
        n_sub_iterations=2,
    )
    tok.train_from_iterator(CORPUS, trainer=trainer)
    tok.post_processor = TemplateProcessing(
        single="$A </s>",
        pair="$A </s> $B </s>",
        special_tokens=[("</s>", tok.token_to_id("</s>"))],
    )
    return tok


def save_fixture(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tok = build_tokenizer()

    from transformers import T5TokenizerFast

    # descending sentinel order => <extra_id_0> gets the TOP id (base),
    # <extra_id_i> = base - i (real T5 layout)
    extra = [f"<extra_id_{i}>" for i in range(NUM_EXTRA_IDS - 1, -1, -1)]
    fast = T5TokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        eos_token="</s>",
        pad_token="<pad>",
        extra_ids=0,  # we place the sentinels ourselves (descending)
        additional_special_tokens=extra,
    )
    fast.save_pretrained(out_dir)

    base = fast.convert_tokens_to_ids("<extra_id_0>")
    meta = {
        "vocab_size": len(fast),
        "sentinel_base": base,
        "pad_token_id": fast.pad_token_id,
        "eos_token_id": fast.eos_token_id,
        "unk_token_id": fast.unk_token_id,
    }
    with open(os.path.join(out_dir, "fixture_meta.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    print(json.dumps(meta))
    # layout invariants the pipeline depends on
    assert fast.pad_token_id == 0 and fast.eos_token_id == 1
    for i in (0, 1, 50, 99):
        assert fast.convert_tokens_to_ids(f"<extra_id_{i}>") == base - i
    enc = fast("What color <extra_id_0> is the cat?")
    assert base in enc["input_ids"], "sentinel must tokenize atomically"
    assert enc["input_ids"][-1] == fast.eos_token_id, "</s> must be appended"


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "tests", "fixtures", "tiny_t5_tokenizer",
    )
    save_fixture(out)
