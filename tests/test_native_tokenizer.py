"""Native C++ WordPiece tokenizer: build, correctness, and speed sanity."""
import time

import pytest

from multimodalrouting_tpu.data.native_tokenizer import load_native_tokenizer

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "the", "patient", "is", "stable", "un", "##stable", "##s",
    "heart", "rate", "elevated", ",", ".", "mon", "##itor", "##ing",
]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    t = load_native_tokenizer(str(p))
    if t is None:
        pytest.skip("no native toolchain")
    return t


def test_vocab_size(tok):
    assert tok.vocab_size == len(VOCAB)


def test_basic_wordpiece(tok):
    ids = tok.encode("The patient is stable.")
    words = [VOCAB[i] for i in ids]
    assert words == ["the", "patient", "is", "stable", "."]


def test_subword_split(tok):
    ids = tok.encode("unstable monitoring")
    assert [VOCAB[i] for i in ids] == ["un", "##stable", "mon", "##itor", "##ing"]


def test_unknown_word_is_unk(tok):
    ids = tok.encode("xylophone")
    assert [VOCAB[i] for i in ids] == ["[UNK]"]


def test_punct_and_case(tok):
    ids = tok.encode("HEART rate, ELEVATED")
    assert [VOCAB[i] for i in ids] == ["heart", "rate", ",", "elevated"]


def test_throughput_sanity(tok):
    text = "the patient is stable . heart rate elevated , monitoring " * 200
    t0 = time.perf_counter()
    n_iter = 50
    for _ in range(n_iter):
        ids = tok.encode(text)
    dt = time.perf_counter() - t0
    toks_per_sec = len(ids) * n_iter / dt
    assert toks_per_sec > 100_000, f"native tokenizer too slow: {toks_per_sec:.0f} tok/s"
