"""Golden tokenizer tests: native C++ WordPiece + chunking vs HuggingFace's
own BertTokenizer (the exact implementation the reference calls at
Model/encoders.py:181-189 / cohort/build_cohort.py:42).

The real Bio_ClinicalBERT vocab is not downloadable in this environment
(zero egress), so the golden reference is transformers.BertTokenizer run
OFFLINE over a vendored vocab with the real BERT special-token layout
([PAD]=0, [UNK]=100, [CLS]=101, [SEP]=102, [MASK]=103). That validates the
ALGORITHM (basic tokenization, greedy longest-match WordPiece, UNK-on-fail,
100-char word cap, overflow-window chunk geometry) against the reference's
actual tokenizer code rather than self-written expectations.

Contract note: the native tokenizer is exact for ASCII clinical text (MIMIC
notes are ASCII); non-ASCII input must not crash but may diverge from HF's
unicode handling (accent stripping, CJK spacing).
"""
from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # imports transformers + builds the C++ lib

transformers = pytest.importorskip("transformers")

WORDS = [
    # whole words a clinical note would contain
    "the", "patient", "was", "admitted", "with", "acute", "on", "chronic",
    "respiratory", "failure", "and", "sepsis", "blood", "pressure", "stable",
    "po", "bid", "prn", "mg", "ml", "iv", "daily", "dose", "history", "of",
    "no", "known", "drug", "allergies", "a", "b", "c", "d", "e",
    # pieces for multi-piece words
    "meto", "##pro", "##lol", "lisin", "##o", "##pril", "hyper", "##tension",
    "brady", "##card", "##ia", "intu", "##bated", "##s", "##ed", "##ing",
    "##25", "##5", "25", "5", "0", "1", "2", "50", "##0",
    # punctuation (single chars are their own tokens after basic tokenize)
    ".", ",", ";", ":", "-", "/", "(", ")", "%", "+", "=", "#", "?", "!",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    """Vocab with the real BERT special-token layout."""
    tokens = ["[PAD]"]
    tokens += [f"[unused{i}]" for i in range(99)]  # ids 1..99
    tokens += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]  # 100..103
    tokens += WORDS
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    path.write_text("\n".join(tokens) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    return transformers.BertTokenizer(
        vocab_file=vocab_file, do_lower_case=True, local_files_only=True
    )


@pytest.fixture(scope="module")
def native_tok(vocab_file):
    from multimodalrouting_tpu.data.native_tokenizer import load_native_tokenizer

    tok = load_native_tokenizer(vocab_file, lowercase=True)
    if tok is None:
        pytest.skip("native toolchain unavailable")
    return tok


CLINICAL_TEXTS = [
    "The patient was admitted with acute on chronic respiratory failure.",
    "metoprolol 25 mg po bid, lisinopril 5 mg daily",
    "history of hypertension; no known drug allergies",
    "BP stable. intubated +sedated (prn)",
    "bradycardia: dose 50/25 = 2",
    "a b c d e " * 40,  # many short words
    "UNKNOWNWORDXYZ notinvocab the patient",
    "",
    "   ",
    "...,,,;;;",
    "x" * 150 + " the patient",  # >100-char word -> [UNK] (HF word cap)
]


class TestWordPieceGolden:
    @pytest.mark.parametrize("idx", range(len(CLINICAL_TEXTS)))
    def test_matches_hf_bert_tokenizer(self, hf_tok, native_tok, idx):
        text = CLINICAL_TEXTS[idx]
        want = hf_tok.encode(text, add_special_tokens=False)
        got = native_tok.encode(text)
        assert got == want, f"text={text[:60]!r}"

    def test_cased_mode_matches_hf(self, vocab_file):
        from multimodalrouting_tpu.data.native_tokenizer import load_native_tokenizer

        hf = transformers.BertTokenizer(
            vocab_file=vocab_file, do_lower_case=False, local_files_only=True
        )
        native = load_native_tokenizer(vocab_file, lowercase=False)
        if native is None:
            pytest.skip("native toolchain unavailable")
        for text in ("the patient was admitted", "The Patient WAS admitted."):
            assert native.encode(text) == hf.encode(text, add_special_tokens=False)

    def test_non_ascii_does_not_crash(self, native_tok):
        ids = native_tok.encode("café 中文 naïve the patient")
        assert all(isinstance(i, int) for i in ids)


class TestChunkGeometryGolden:
    def test_overflow_windows_match_hf(self, hf_tok, native_tok):
        """Sliding-window chunking vs HF return_overflowing_tokens
        (reference Model/encoders.py:181-189: max_length, stride=64)."""
        from multimodalrouting_tpu.data.tokenization import ChunkingConfig, chunk_token_ids

        text = "the patient was admitted with acute respiratory failure and sepsis " * 30
        max_len, stride = 32, 8

        enc = hf_tok(
            text,
            add_special_tokens=True,
            truncation=True,
            max_length=max_len,
            stride=stride,
            return_overflowing_tokens=True,
            padding="max_length",
        )
        hf_chunks = np.atleast_2d(np.asarray(enc["input_ids"]))
        hf_attn = np.atleast_2d(np.asarray(enc["attention_mask"]))

        ids = native_tok.encode(text)
        cfg = ChunkingConfig(max_len=max_len, stride=stride, max_chunks=hf_chunks.shape[0])
        got_ids, got_attn = chunk_token_ids(ids, cfg)

        assert got_ids.shape == hf_chunks.shape
        np.testing.assert_array_equal(got_ids, hf_chunks)
        np.testing.assert_array_equal(got_attn, hf_attn)

    def test_short_text_single_chunk(self, hf_tok, native_tok):
        from multimodalrouting_tpu.data.tokenization import ChunkingConfig, chunk_token_ids

        text = "the patient was admitted"
        enc = hf_tok(
            text, add_special_tokens=True, truncation=True, max_length=32,
            stride=8, return_overflowing_tokens=True, padding="max_length",
        )
        got_ids, got_attn = chunk_token_ids(
            native_tok.encode(text), ChunkingConfig(max_len=32, stride=8, max_chunks=4)
        )
        np.testing.assert_array_equal(got_ids[:1], np.atleast_2d(np.asarray(enc["input_ids"])))
        np.testing.assert_array_equal(got_attn[:1], np.atleast_2d(np.asarray(enc["attention_mask"])))
