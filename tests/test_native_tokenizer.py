"""Native C++ WordPiece tokenizer parity vs the Python reference."""
import tempfile

import numpy as np
import pytest

from candidate_reranking_cir_tpu.models.tokenizer import (
    WordPieceTokenizer,
    build_test_vocab,
)

native = pytest.importorskip(
    "candidate_reranking_cir_tpu.models.native_tokenizer")
if not native.native_available():
    pytest.skip("libwordpiece.so not built (make -C native)",
                allow_module_level=True)

TEXTS = [
    "The DRESS is red, and blue!",
    "a dog with a cat.",
    "drèss", "CAFÉ naïve",
    "zzqx 123", "Is the same image?",
    "shirt dresss dressed dressing",
    "hello\tworld\nnewline", "漢字 test", "...!!??", "",
    "a" * 150,  # over max_chars_per_word -> [UNK]
]


@pytest.fixture(scope="module")
def pair():
    vocab = build_test_vocab()
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for tok, _ in sorted(vocab.items(), key=lambda kv: kv[1]):
            f.write(tok + "\n")
        path = f.name
    return (WordPieceTokenizer(vocab),
            native.NativeWordPieceTokenizer(path))


def test_metadata(pair):
    py, nat = pair
    assert nat.vocab_size == py.vocab_size
    assert nat.enc_token_id == py.enc_token_id
    assert nat.dec_token_id == py.dec_token_id
    assert nat.pad_id == py.pad_id


@pytest.mark.parametrize("set_enc", [False, True])
@pytest.mark.parametrize("max_len", [8, 16, 40])
def test_encode_parity(pair, set_enc, max_len):
    py, nat = pair
    i1, m1 = py.encode(TEXTS, max_len, set_enc_token=set_enc,
                       overflow="truncate")
    i2, m2 = nat.encode(TEXTS, max_len, set_enc_token=set_enc,
                        overflow="truncate")
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(m1, m2)


def test_fuzz_against_python(pair):
    """Random unicode fuzzing: byte-identical ids/masks on mixed-script text
    (this surfaced the accent-folding divergence the generated table fixed)."""
    import random

    py, nat = pair
    rng = random.Random(0)
    pools = ["abcdefghijklmnopqrstuvwxyz ", "ABCDEFG .,!?'-\t\n",
             "àéîõüçñ ÆØþ ", "日本語漢字 test ", "0123456789  --  ",
             "ĀāĎďĚěĹĺŇňŘřŠšŽž ", "ß×÷ "]
    texts = ["".join(rng.choice(rng.choice(pools))
                     for _ in range(rng.randint(0, 40)))
             for _ in range(1000)]
    a, ma = py.encode(texts, 16, overflow="truncate")
    b, mb = nat.encode(texts, 16, overflow="truncate")
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ma, mb)


def test_native_overflow_policy_parity(pair):
    py, nat = pair
    long_caption = " ".join(["the red dress and the blue shirt"] * 7)
    for tok in (py, nat):
        before = tok.overflow_count
        with pytest.raises(ValueError, match="exceed the static text bucket"):
            tok.encode([long_caption], 8)
        with pytest.warns(UserWarning, match="1/1 caption"):
            tok.encode([long_caption], 8, overflow="warn")
        assert tok.overflow_count == before + 1
