"""Differential fuzz: WordPieceTokenizer (python + native C++) vs
transformers.BertTokenizer instantiated from the SAME local vocab file.

The reference tokenizes with HF's BertTokenizer (blip.py:186-191); this
framework reimplements the bert-base-uncased pipeline offline. Any
tokenization divergence shifts every downstream number, so the pipelines are
fuzzed against each other on a synthetic vocab covering whole words,
##continuations, punctuation, accents (NFD stripping), CJK spacing, digits,
[UNK] handling, and the 100-char long-word cutoff.

Also: the production-CLI vocab hardening tests — no --vocab is a hard error,
a nonexistent --vocab path is a hard error (never a silent toy-vocab
fallback).
"""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from candidate_reranking_cir_tpu.models.tokenizer import (
    WordPieceTokenizer,
    build_test_vocab,
    load_tokenizer,
)

WORDS = ["the", "a", "and", "is", "with", "of", "same", "image", "dress",
         "shirt", "red", "blue", "dog", "cat", "photo", "wearing", "change",
         "remove", "make", "it", "shorter", "longer", "darker"]
PIECES = ["##ing", "##ed", "##s", "##er", "##est", "##o", "##to"]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    vocab = build_test_vocab(extra_words=WORDS + PIECES
                             + ["照", "片", "cafe", "naive"])
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    ordered = sorted(vocab.items(), key=lambda kv: kv[1])
    path.write_text("\n".join(t for t, _ in ordered) + "\n",
                    encoding="utf-8")
    return path


@pytest.fixture(scope="module")
def tokenizers(vocab_file):
    hf = transformers.BertTokenizer(vocab_file=str(vocab_file))
    mine = WordPieceTokenizer.from_vocab_file(vocab_file)
    impls = {"python": mine}
    try:
        from candidate_reranking_cir_tpu.models.native_tokenizer import (
            NativeWordPieceTokenizer,
            native_available,
        )

        if native_available():
            impls["native"] = NativeWordPieceTokenizer(vocab_file)
    except Exception:
        pass
    return hf, impls


def _fuzz_corpus(seed=0, n=250):
    rng = np.random.default_rng(seed)
    atoms = (WORDS + ["dresses", "making", "photoo", "unknownword",
                      "cafè", "naïve", "CAFE", "DReSS",
                      "照片", "red照dress", "3", "42", "3.5", "it's",
                      "red-blue", "a,b", "!?", "...", "--", "'quoted'",
                      "(paren)", "tab\there", "x" * 101, "y" * 99])
    out = ["", " ", "hello", "a photo of a red dress"]
    for _ in range(n):
        k = int(rng.integers(1, 9))
        words = [atoms[int(i)] for i in rng.integers(0, len(atoms), size=k)]
        sep = " " if rng.random() < 0.9 else "  "
        out.append(sep.join(words))
    return out


def test_wordpiece_matches_hf_bert_tokenizer(tokenizers):
    hf, impls = tokenizers
    texts = _fuzz_corpus()
    for name, tok in impls.items():
        ids, mask = tok.encode(texts, 256, overflow="error")
        for i, text in enumerate(texts):
            ref = hf(text)["input_ids"]
            n = int(mask[i].sum())
            assert ids[i, :n].tolist() == ref, (
                f"{name} diverges from HF on {text!r}: "
                f"{ids[i, :n].tolist()} vs {ref}")


def test_wordpiece_matches_hf_token_strings(tokenizers):
    """String-level check too, so an id-table bug can't mask a split bug."""
    hf, impls = tokenizers
    for text in _fuzz_corpus(seed=7, n=60):
        ref = hf.tokenize(text)
        got = impls["python"].tokenize(text)
        assert got == ref, f"{text!r}: {got} vs {ref}"


# ---------------------------------------------------------------------------
# vocab hardening


def test_no_vocab_is_a_hard_error():
    with pytest.raises(ValueError, match="allow-test-vocab"):
        load_tokenizer(None)


def test_nonexistent_vocab_path_is_a_hard_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="fetch_vocab"):
        load_tokenizer(tmp_path / "definitely_not_here.txt")


def test_explicit_opt_in_returns_test_vocab():
    tok = load_tokenizer(None, allow_test_vocab=True)
    assert tok.vocab_size < 200


def test_cli_requires_vocab(tmp_path):
    """A production CLI invoked without --vocab must die with the actionable
    message, not run with the toy vocabulary."""
    from candidate_reranking_cir_tpu.cli import validate

    with pytest.raises(ValueError, match="allow-test-vocab"):
        validate.main(["--dataset", "CIRR", "--data-root", str(tmp_path),
                       "--stage1-path", "nope"])


def test_fetch_vocab_validation(tmp_path):
    from candidate_reranking_cir_tpu.cli import fetch_vocab

    short = tmp_path / "short.txt"
    short.write_text("a\nb\n")
    with pytest.raises(ValueError, match="30522"):
        fetch_vocab.validate_vocab_file(short)

    full = tmp_path / "full.txt"
    full.write_text("\n".join(f"tok{i}" for i in range(30522)) + "\n")
    info = fetch_vocab.validate_vocab_file(full)
    assert info["lines"] == 30522
    with pytest.raises(ValueError, match="sha256"):
        fetch_vocab.validate_vocab_file(full, expect_sha256="0" * 64)
