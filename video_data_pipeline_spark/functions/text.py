"""Text/tokenizer function library.

The reference tokenizes with SentencePiece models plus hand-spliced special
tokens (tokenize/tokenizer.py:651-686, tokenize/main.py:94-147). The model
file isn't shippable here, so the engine exposes:

- a **deterministic hash tokenizer** (word → 60-bit md5 hash mod vocab) as
  the default executor kernel — engine-portable, oracle-checkable;
- a **SentencePiece wrapper** gated behind import, lazily initialized once
  per executor (the broadcast-model pattern), drop-in replaceable.

Special-token semantics (``<im_start>``/``<im_patch>``/``<im_end>``,
loss-mask rules) are pure Python here and shared by both tokenizers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

try:  # pragma: no cover - not in this container
    import sentencepiece  # type: ignore  # noqa: F401

    HAVE_SENTENCEPIECE = True
except Exception:  # noqa: BLE001
    HAVE_SENTENCEPIECE = False

#: special token ids (tokenize/main.py:32, index/check_pair.py:38-40)
IM_PATCH = 32000
IM_START = 32001
IM_END = 32002
BOS = 1
EOS = 2
N_PATCHES = 256  # <im_patch> repetitions per image (tokenize/main.py:32)

VOCAB = 32000


def hash_token_id(word: str) -> int:
    """Stable 60-bit md5 → id in [3, VOCAB) (0..2 reserved)."""
    h = int(hashlib.md5(word.encode("utf-8")).hexdigest()[:15], 16)
    return 3 + (h % (VOCAB - 3))


def encode_text(text: str) -> list[int]:
    """Whitespace hash-tokenize (the SentencePiece stand-in)."""
    return [hash_token_id(w) for w in text.split()]


def add_image_tokens(ids: list[int], n_images: int) -> list[int]:
    """Prepend per-image special blocks: <im_start> + 256·<im_patch> +
    <im_end> (tokenize/main.py:94-112 applied in id space)."""
    block = [IM_START] + [IM_PATCH] * N_PATCHES + [IM_END]
    return block * n_images + ids


def tokenize_conversation(
    turns: list[tuple[str, str]], n_images: int = 0
) -> tuple[list[int], list[int]]:
    """BOS + per-turn encode; EOS after gpt turns; loss_mask 0 for human /
    1 for gpt (tokenize/main.py:132-147)."""
    ids: list[int] = [BOS]
    mask: list[int] = [0]
    if n_images:
        img = add_image_tokens([], n_images)
        ids += img
        mask += [0] * len(img)
    for who, text in turns:
        toks = encode_text(text)
        if who == "gpt":
            toks = toks + [EOS]
            mask += [1] * len(toks)
        else:
            mask += [0] * len(toks)
        ids += toks
    return ids, mask


def merge_packed(records: list[tuple[list[int], list[int]]]) -> tuple[list[int], list[int]]:
    """Merge bin-packed samples dropping each non-first record's duplicated
    BOS (``save_to_tar`` slice semantics, tokenize/main.py:76-79)."""
    ids: list[int] = []
    mask: list[int] = []
    for i, (r_ids, r_mask) in enumerate(records):
        if i == 0:
            ids += r_ids
            mask += r_mask
        else:
            ids += r_ids[1:]
            mask += r_mask[1:]
    return ids, mask


def tokenize_batch(
    it: Iterator[pd.DataFrame], text_col: str = "text"
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: text → (input_ids, loss_mask, n_tokens)."""
    for pdf in it:
        ids_col, mask_col = [], []
        for text in pdf[text_col]:
            ids, mask = tokenize_conversation([("human", ""), ("gpt", text or "")])
            ids_col.append(ids)
            mask_col.append(mask)
        out = pdf.copy()
        out["input_ids"] = ids_col
        out["loss_mask"] = mask_col
        out["n_tokens"] = [len(x) for x in ids_col]
        yield out


def check_sample(input_ids: list[int], loss_mask: list[int], n_images: int) -> str | None:
    """Index-stage invariants (index/check_pair.py:37-40); returns the
    violated rule or None."""
    if len(input_ids) != len(loss_mask):
        return "len(input_ids) != len(loss_mask)"
    if len(input_ids) >= 8000:
        return "len(input_ids) >= 8000"
    if input_ids.count(IM_START) != input_ids.count(IM_END):
        return "unbalanced <im_start>/<im_end>"
    if input_ids.count(IM_PATCH) != N_PATCHES * n_images:
        return "count(<im_patch>) != 256 * n_images"
    return None


_SPECIAL_NAMES = {
    BOS: "<s>",
    EOS: "</s>",
    IM_PATCH: "<im_patch>",
    IM_START: "<im_start>",
    IM_END: "<im_end>",
}


def detokenize(ids: list[int]) -> str:
    """Inverse rendering for inspection (reference ``detokenize``,
    tokenize/tokenizer.py:675-686, used by the index golden dump).

    The hash tokenizer is one-way, so ordinary ids render as ``⟨id⟩``
    placeholders while special tokens render by name — enough to audit
    structure (BOS/EOS placement, image blocks, masking spans), which is
    what the reference's golden dump checks."""
    out = []
    for i in ids:
        out.append(_SPECIAL_NAMES.get(i, f"⟨{i}⟩"))
    return " ".join(out)


def vocab_size_with_padding(
    vocab_size: int, divisor: int = 128, tp_size: int = 1
) -> int:
    """Round vocab up to a multiple of (divisor × tensor-parallel size)
    (tokenize/tokenizer.py:11-24)."""
    multiple = divisor * tp_size
    return ((vocab_size + multiple - 1) // multiple) * multiple
