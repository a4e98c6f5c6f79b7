"""WordPiece tokenizer: unit behavior + parity vs the HF tokenizers package."""

import numpy as np
import pytest

from sema_tpu.tokenizer.wordpiece import (
    HashTokenizer, WordPieceTokenizer, basic_tokenize,
)

VOCAB_TOKENS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
    "over", "lazy", "dog", "hello", "world", "un", "##aff", "##able",
    "!", ",", ".", "'", "a", "b", "c", "##a", "##b", "##c", "1", "##1",
]
VOCAB = {t: i for i, t in enumerate(VOCAB_TOKENS)}


@pytest.fixture()
def tok():
    return WordPieceTokenizer(VOCAB)


def test_basic_tokenize_lowercase_punct():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]


def test_basic_tokenize_accents():
    assert basic_tokenize("Héllo") == ["hello"]


def test_basic_tokenize_cjk_isolation():
    assert basic_tokenize("ab中国cd") == ["ab", "中", "国", "cd"]


def test_basic_tokenize_control_chars_removed():
    assert basic_tokenize("a\x00b\x1fc") == ["abc"]


def test_wordpiece_greedy_longest_match(tok):
    assert tok.tokenize("jumps") == ["jump", "##s"]
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]


def test_wordpiece_unk_for_unmatchable(tok):
    assert tok.tokenize("zzz") == ["[UNK]"]


def test_wordpiece_long_word_unk():
    t = WordPieceTokenizer(VOCAB, max_word_chars=5)
    assert t.tokenize("aaaaaa") == ["[UNK]"]


def test_encode_adds_specials_and_truncates(tok):
    ids, mask = tok.encode("the quick brown fox", max_length=4)
    # [CLS] the quick brown — hard truncation, no trailing [SEP]
    # (parity with embeddings.rs:40-46 .take(MAX_LENGTH))
    assert ids == [VOCAB["[CLS]"], VOCAB["the"], VOCAB["quick"], VOCAB["brown"]]
    assert mask == [1, 1, 1, 1]


def test_encode_short_has_cls_sep(tok):
    ids, mask = tok.encode("hello world", max_length=16)
    assert ids[0] == VOCAB["[CLS]"]
    assert ids[-1] == VOCAB["[SEP]"]
    assert len(ids) == 4 and len(mask) == 4


def test_hash_tokenizer_deterministic_and_in_range():
    t = HashTokenizer(vocab_size=1000)
    ids1, _ = t.encode("some words here", max_length=32)
    ids2, _ = t.encode("some words here", max_length=32)
    assert ids1 == ids2
    assert all(0 <= i < 1000 for i in ids1)
    ids3, _ = t.encode("different words", max_length=32)
    assert ids1 != ids3


def test_parity_vs_hf_tokenizers():
    """Token-for-token parity with the Rust tokenizers crate the reference
    uses (embeddings.rs:20), over a shared vocab."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    hf = Tokenizer(models.WordPiece(VOCAB, unk_token="[UNK]",
                                    max_input_chars_per_word=100))
    hf.normalizer = normalizers.BertNormalizer(lowercase=True)
    hf.pre_tokenizer = pre_tokenizers.BertPreTokenizer()

    ours = WordPieceTokenizer(VOCAB)
    cases = [
        "The quick brown fox jumps over the lazy dog!",
        "Hello, World! It's unaffable.",
        "MiXeD CaSe WiTh AcCeNtS: héllo wörld",
        "numbers 111 and letters abc",
        "punct...everywhere,,,ok?!",
        "中国 words mixed 世界",
        "   leading and   trailing   spaces   ",
        "tabs\tand\nnewlines\r\nmixed",
    ]
    for text in cases:
        got = ours.tokenize(text)
        want = hf.encode(text).tokens
        assert got == want, f"{text!r}: {got} != {want}"


def test_hf_backend_matches_pure():
    """The production Rust backend and the pure-Python oracle produce
    identical encodings (specials + hard truncation included)."""
    pytest.importorskip("tokenizers")
    from sema_tpu.tokenizer.wordpiece import HFTokenizerBackend
    hf = HFTokenizerBackend(VOCAB)
    py = WordPieceTokenizer(VOCAB)
    cases = ["The quick brown fox jumps over the lazy dog!",
             "unaffable, unaffable... UNAFFABLE",
             "", "a b c 1 11"]
    for text in cases:
        for max_len in (4, 16, 64):
            assert hf.encode(text, max_len) == py.encode(text, max_len)
    batch = hf.encode_batch(cases, 16)
    assert batch == [py.encode(t, 16) for t in cases]


def test_load_tokenizer_from_vocab_file(tmp_path):
    from sema_tpu.tokenizer import load_tokenizer
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB_TOKENS) + "\n")
    tok, source = load_tokenizer(100, path=str(tmp_path))
    assert source == "local"
    ids, _ = tok.encode("hello world", 8)
    assert ids == [VOCAB["[CLS]"], VOCAB["hello"], VOCAB["world"],
                   VOCAB["[SEP]"]]


# -- ASCII fast lane (translate+split) vs the per-char reference path ------

def test_ascii_fast_lane_matches_slow_path():
    from sema_tpu.tokenizer.wordpiece import _basic_tokenize_slow
    import random
    rng = random.Random(7)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n\r!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~\x00\x01\x1f\x7f")
    for _ in range(200):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 120)))
        assert s.isascii()
        for lc in (True, False):
            assert (basic_tokenize(s, lc)
                    == _basic_tokenize_slow(s, lc)), (repr(s), lc)


def test_ascii_fast_lane_code_like_inputs():
    from sema_tpu.tokenizer.wordpiece import _basic_tokenize_slow
    cases = [
        "def foo(bar, baz=3):\n    return bar*baz  # comment",
        "x = a[i] + b->c::d; /* ok */",
        "URL: https://example.com/path?q=1&r=2",
        "\tif (x != y) { z += 1; }\r\n",
        "snake_case camelCase SCREAMING_CASE dunder__init__",
        "",
        "   ",
        "!!!",
    ]
    for s in cases:
        for lc in (True, False):
            assert basic_tokenize(s, lc) == _basic_tokenize_slow(s, lc), s


def test_non_ascii_still_takes_reference_path():
    # accents + CJK still handled (slow path); results unchanged
    assert basic_tokenize("Héllo 中国 Wörld!") == [
        "hello", "中", "国", "world", "!"]


def test_hash_bucket_cache_consistent():
    t = HashTokenizer(1000)
    a = t.encode("alpha beta alpha", 16)[0]
    b = t.encode("alpha beta alpha", 16)[0]   # cached second time
    assert a == b
    fresh = HashTokenizer(1000).encode("alpha beta alpha", 16)[0]
    assert a == fresh


def test_wordpiece_cache_consistent(tok):
    first = tok.tokenize("the quick jumps unaffable")
    again = tok.tokenize("the quick jumps unaffable")
    assert first == again
    assert tok.wordpiece("jumps") == tok._wordpiece_uncached("jumps")
