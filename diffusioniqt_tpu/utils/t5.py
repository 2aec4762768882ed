"""T5 text-encoder bridge (reference ``t5.py:27-119``).

Lazy singleton HF T5 encoder producing (embeddings, attention mask) for the
text-conditional paths (video U-Net, elucidated cascade). The 3D IQT training
path never uses text (reference imagen_pytorch3D.py:1801 hardcodes
``condition_on_text=False``).

This image has ``transformers`` but no network egress, so pretrained weights
may be unavailable — ``t5_encode_text`` raises a clear error in that case,
and ``hash_text_encode`` provides a deterministic stand-in embedding for
tests and smoke runs.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np

DEFAULT_T5_NAME = "google/t5-v1_1-base"

T5_CONFIGS = {
    "t5-small": 512,
    "t5-base": 768,
    "t5-large": 1024,
    "google/t5-v1_1-small": 512,
    "google/t5-v1_1-base": 768,
    "google/t5-v1_1-large": 1024,
    "google/t5-v1_1-xl": 2048,
    "google/t5-v1_1-xxl": 4096,
}

_CACHE = {}


def get_encoded_dim(name: str = DEFAULT_T5_NAME) -> int:
    """Embedding dim for a T5 variant (reference t5.py get_encoded_dim)."""
    if name in T5_CONFIGS:
        return T5_CONFIGS[name]
    return 768


def _get_model_and_tokenizer(name: str):
    if name in _CACHE:
        return _CACHE[name]
    try:
        from transformers import T5EncoderModel, T5Tokenizer

        tokenizer = T5Tokenizer.from_pretrained(name)
        model = T5EncoderModel.from_pretrained(name)
        model.eval()
    except Exception as e:  # pragma: no cover - no weights in this image
        raise RuntimeError(
            f"could not load T5 '{name}' (offline image / no cached weights): "
            f"{e}. Use hash_text_encode for tests."
        ) from e
    _CACHE[name] = (model, tokenizer)
    return _CACHE[name]


def t5_encode_text(
    texts: List[str],
    name: str = DEFAULT_T5_NAME,
    max_length: int = 256,
    return_attn_mask: bool = False,
):
    """Tokenize + encode text; masked positions zeroed (reference
    t5.py:107-119)."""
    import torch

    model, tokenizer = _get_model_and_tokenizer(name)
    enc = tokenizer(
        texts, return_tensors="pt", padding="longest",
        max_length=max_length, truncation=True,
    )
    with torch.no_grad():
        out = model(input_ids=enc.input_ids, attention_mask=enc.attention_mask)
    emb = out.last_hidden_state.numpy()
    mask = enc.attention_mask.numpy().astype(bool)
    emb = emb * mask[..., None]
    if return_attn_mask:
        return emb, mask
    return emb


def hash_text_encode(
    texts: List[str],
    dim: int = 768,
    max_length: int = 16,
    return_attn_mask: bool = False,
):
    """Deterministic pseudo-embeddings from text hashes — a weights-free
    stand-in with the same interface, for tests/smoke in offline images."""
    batch = len(texts)
    emb = np.zeros((batch, max_length, dim), np.float32)
    mask = np.zeros((batch, max_length), bool)
    for i, text in enumerate(texts):
        words = text.split()[:max_length]
        for j, word in enumerate(words):
            digest = hashlib.sha256(word.encode()).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            emb[i, j] = rng.standard_normal(dim).astype(np.float32)
            mask[i, j] = True
    if return_attn_mask:
        return emb, mask
    return emb
