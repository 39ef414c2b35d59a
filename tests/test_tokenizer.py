import numpy as np

from candidate_reranking_cir_tpu.models.tokenizer import (
    WordPieceTokenizer,
    build_test_vocab,
)


def make_tok(**kw):
    return WordPieceTokenizer(build_test_vocab(**kw))


def test_basic_wordpiece():
    tok = make_tok()
    assert tok.tokenize("the red dress") == ["the", "red", "dress"]
    # continuation pieces
    assert tok.tokenize("dresss") == ["dress", "##s"]
    # unknown full word falls back to char pieces or UNK
    pieces = tok.tokenize("zzqx")
    assert pieces[0] in ("z", "[UNK]")


def test_lowercase_and_punct():
    tok = make_tok()
    assert tok.tokenize("The DRESS.") == ["the", "dress", "."]
    assert tok.tokenize("red,blue") == ["red", ",", "blue"]


def test_accent_stripping():
    tok = make_tok()
    assert tok.tokenize("drèss") == ["dress"]


def test_encode_fixed_shape():
    tok = make_tok()
    ids, mask = tok.encode(["the red dress", "a"], max_len=8)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert ids[0, 0] == tok.cls_id
    # [CLS] the red dress [SEP]
    assert mask[0].sum() == 5
    assert ids[0, 4] == tok.sep_id
    assert (ids[0, 5:] == tok.pad_id).all()
    assert mask[1].sum() == 3


def test_encode_truncation_keeps_sep():
    tok = make_tok()
    ids, mask = tok.encode(["the red dress and the blue shirt and the dog"],
                           max_len=6, overflow="truncate")
    assert mask[0].sum() == 6
    assert ids[0, -1] == tok.sep_id


def test_encode_overflow_raises_by_default():
    # Reference pads-to-longest with NO truncation (blip_stage1.py:72); a
    # 45-token caption in a 40-token bucket must fail loudly, never silently.
    tok = make_tok()
    long_caption = " ".join(["the red dress and the blue shirt"] * 7)  # 49 toks
    assert len(tok.tokenize(long_caption)) > 40
    import pytest

    with pytest.raises(ValueError, match=r"exceed the static text bucket"):
        tok.encode([long_caption], max_len=40)
    # fits once the bucket is raised -> identical to pad-to-longest numerics
    ids, mask = tok.encode([long_caption], max_len=64)
    assert mask[0].sum() == len(tok.tokenize(long_caption)) + 2


def test_encode_overflow_warn_counts():
    tok = make_tok()
    tok.overflow = "warn"
    long_caption = " ".join(["red dress"] * 30)
    import pytest

    with pytest.warns(UserWarning, match=r"1/2 caption"):
        tok.encode([long_caption, "red dress"], max_len=16)
    assert tok.overflow_count == 1


def test_enc_token_injection():
    tok = make_tok()
    ids, _ = tok.encode(["red dress"], max_len=8, set_enc_token=True)
    assert ids[0, 0] == tok.enc_token_id
    assert tok.enc_token_id == tok.vocab["[ENC]"]
    assert tok.dec_token_id == tok.vocab["[DEC]"]


def test_special_ids_appended_at_end():
    tok = make_tok()
    base = len(build_test_vocab())
    assert {tok.dec_token_id, tok.enc_token_id} == {base, base + 1}
