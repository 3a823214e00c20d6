"""The committed real-subword tokenizer fixture: T5 layout invariants.

The fixture (tests/fixtures/tiny_t5_tokenizer) is a genuine
T5TokenizerFast (Unigram + Metaspace — sentencepiece semantics) trained
offline by tools/make_tokenizer_fixture.py. These tests pin the layout
properties the pipeline depends on (reference tokenizer behavior:
src/data_loader_manager/data_loader_wrapper.py:43-62 and
module_parser.py:397-413).
"""

import json
import os

import numpy as np
import pytest

from explicit_alignment_for_vqa_tasks_tpu.data.tokenization import (
    load_tokenizer,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "tiny_t5_tokenizer")


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer("T5TokenizerFast", FIXTURE)


@pytest.fixture(scope="module")
def meta():
    with open(os.path.join(FIXTURE, "fixture_meta.json")) as fh:
        return json.load(fh)


def test_special_token_layout(tok, meta):
    assert tok.pad_token_id == 0
    assert tok.eos_token_id == 1
    assert tok.unk_token_id == 2
    base = meta["sentinel_base"]
    for i in (0, 1, 7, 99):
        assert tok.convert_tokens_to_ids(f"<extra_id_{i}>") == base - i


def test_sentinels_tokenize_atomically(tok, meta):
    base = meta["sentinel_base"]
    text = ("<extra_id_0>\nCombine facts and answer this:\n"
            "what color is the cat?\n<extra_id_1>\nanswer\n")
    ids = tok(text)["input_ids"]
    assert ids.count(base) == 1
    assert ids.count(base - 1) == 1
    # eos appended by the T5 post-processor
    assert ids[-1] == tok.eos_token_id


def test_subword_not_whitespace(tok):
    # a REAL subword tokenizer splits unseen words into pieces — the
    # whitespace SimpleTokenizer can't do this
    ids = tok("unseenwordxyz", add_special_tokens=False)["input_ids"]
    assert len(ids) > 1


def test_left_padding_for_decoder_generation(tok):
    tok.padding_side = "left"
    try:
        enc = tok(["<pad> yes", "<pad> maybe not entirely sure"],
                  padding="longest", return_tensors="np")
        ids = np.asarray(enc["input_ids"])
        # padding goes on the LEFT; both rows end with eos
        assert ids[0, 0] == tok.pad_token_id
        assert ids[0, -1] == tok.eos_token_id
        assert ids[1, -1] == tok.eos_token_id
        mask = np.asarray(enc["attention_mask"])
        assert mask[0, 0] == 0 and mask[0, -1] == 1
    finally:
        tok.padding_side = "right"


def test_decode_roundtrip(tok):
    ids = tok("what color is the cat?")["input_ids"]
    text = tok.decode(ids, skip_special_tokens=True)
    assert "what color is the cat?" in text


def test_thread_safety_under_concurrent_collate(tok):
    """HF fast tokenizers mutate shared Rust state per call and raise
    'Already borrowed' under concurrent threads (observed in the round-2
    CLI run with pool collate). load_tokenizer wraps fast tokenizers in
    ThreadSafeTokenizer (thread-local copies) — hammer it from many
    threads with ALTERNATING truncation/padding settings (what forces the
    Rust-side mutation) and distinct padding sides."""
    from concurrent.futures import ThreadPoolExecutor

    def work(i):
        side = "left" if i % 2 else "right"
        enc = tok(
            [f"what color is object {i} ?", "a much longer question about "
             "the picture that will certainly need truncation handling"],
            padding="longest", max_length=8 + (i % 3) * 4, truncation=True,
            return_tensors="np", padding_side=side,
        )
        ids = enc["input_ids"]
        if side == "left":
            assert ids[0][0] == tok.pad_token_id or ids[0][-1] != 0
        return ids.shape

    with ThreadPoolExecutor(max_workers=8) as pool:
        shapes = list(pool.map(work, range(200)))
    assert len(shapes) == 200


def test_setup_mutations_visible_across_threads(tok):
    """Setup-time attribute writes (e.g. pad=eos in ClipCapExecutor) must
    be observed by copies in other threads."""
    import threading

    tok.bos_token = tok.pad_token
    seen = {}

    def read():
        seen["bos"] = tok.bos_token

    t = threading.Thread(target=read)
    t.start()
    t.join()
    assert seen["bos"] == tok.pad_token


def test_regeneration_is_deterministic(tmp_path):
    from explicit_alignment_for_vqa_tasks_tpu.tools.make_tokenizer_fixture \
        import save_fixture

    save_fixture(str(tmp_path))
    fresh = json.load(open(tmp_path / "fixture_meta.json"))
    committed = json.load(open(os.path.join(FIXTURE, "fixture_meta.json")))
    assert fresh == committed