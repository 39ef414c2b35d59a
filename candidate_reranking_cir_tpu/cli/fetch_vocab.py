"""Fetch bert-base-uncased's WordPiece vocabulary into the local cache.

The reference obtains the vocab implicitly via the HuggingFace hub at every
run (blip.py:186-191, ``BertTokenizer.from_pretrained('bert-base-uncased')``)
and keeps a pickled tokenizer as an outage fallback (blip_stage2.py:38-44).
This framework instead provisions the 30,522-line ``vocab.txt`` ONCE into a
cache and every CLI takes it via ``--vocab`` — offline afterwards, no pickle.

The [DEC]/[ENC] special tokens (ids 30522/30523) are appended at load time by
the tokenizer itself (models/tokenizer.py), matching the reference's runtime
``add_special_tokens`` — the fetched file stays byte-identical to the
published artifact. The tool always enforces the 30,522-line shape and prints
the sha256; pass ``--expect-sha256`` to additionally pin an exact digest.

Usage::

    python -m candidate_reranking_cir_tpu.cli.fetch_vocab
    python -m candidate_reranking_cir_tpu.cli.fetch_vocab --out ./vocab.txt
"""
from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

# canonical sources, tried in order
URLS = (
    "https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt",
    "https://huggingface.co/google-bert/bert-base-uncased/resolve/main/"
    "vocab.txt",
)
BASE_VOCAB_SIZE = 30522


def default_cache_path() -> Path:
    return (Path.home() / ".cache" / "candidate_reranking_cir_tpu"
            / "vocab" / "bert-base-uncased-vocab.txt")


def validate_vocab_file(path: Path, *, expect_sha256: str = "") -> dict:
    """Sanity-check a vocab file: 30,522-entry shape, plus an exact digest
    when the caller pins one."""
    data = path.read_bytes()
    n_lines = len(data.decode("utf-8").splitlines())
    digest = hashlib.sha256(data).hexdigest()
    if n_lines != BASE_VOCAB_SIZE:
        raise ValueError(
            f"{path}: expected {BASE_VOCAB_SIZE} vocab entries, found "
            f"{n_lines} — not the published bert-base-uncased vocab.txt")
    if expect_sha256 and digest != expect_sha256.lower():
        raise ValueError(f"{path}: sha256 {digest} != expected "
                         f"{expect_sha256}")
    return {"lines": n_lines, "sha256": digest}


def fetch(out: Path, *, expect_sha256: str = "",
          force: bool = False) -> Path:
    from urllib.request import urlretrieve

    if out.exists() and not force:
        info = validate_vocab_file(out, expect_sha256=expect_sha256)
        print(f"cached: {out} ({info['lines']} entries, "
              f"sha256 {info['sha256']})")
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    last_err: Exception | None = None
    for url in URLS:
        try:
            print(f"fetching {url} ...")
            tmp = out.with_suffix(".part")
            urlretrieve(url, tmp)
            info = validate_vocab_file(tmp, expect_sha256=expect_sha256)
            tmp.rename(out)
            print(f"saved {out} ({info['lines']} entries, "
                  f"sha256 {info['sha256']})")
            return out
        except Exception as e:  # noqa: BLE001 — try the mirror, then report
            last_err = e
    raise RuntimeError(
        f"could not fetch vocab.txt from any source ({last_err!r}); if this "
        "machine has no egress, copy bert-base-uncased's vocab.txt here "
        f"manually: {out}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--out", type=str, default="",
                        help=f"destination (default: {default_cache_path()})")
    parser.add_argument("--expect-sha256", type=str, default="",
                        help="pin the exact digest of the fetched file")
    parser.add_argument("--force", action="store_true",
                        help="re-download even if cached")
    args = parser.parse_args(argv)
    out = Path(args.out) if args.out else default_cache_path()
    path = fetch(out, expect_sha256=args.expect_sha256, force=args.force)
    print(f"\nuse with every CLI:  --vocab {path}")


if __name__ == "__main__":
    sys.exit(main())
