"""T5 text-encoder bridge (reference ``t5.py:27-119``).

Lazy singleton HF T5 encoder producing (embeddings, attention mask) for the
text-conditional paths (video U-Net, elucidated cascade). The 3D IQT training
path never uses text (reference imagen_pytorch3D.py:1801 hardcodes
``condition_on_text=False``).

This image has ``transformers`` but no network egress, so pretrained
weights may be unavailable. Three tiers keep the path exercisable:
pretrained weights when fetchable; ``allow_random_init=True`` runs the
genuine HF ``T5EncoderModel`` forward with deterministic random weights
and a sentencepiece-free tokenizer (same code path — swap in real weights
with no change); ``hash_text_encode`` is a model-free stand-in.
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


class _WhitespaceTokenizer:
    """Sentencepiece-free stand-in tokenizer: words hash to stable ids,
    with T5's </s>=1 terminator and pad=0. Only used with random-init
    encoders — real checkpoints pair with the real tokenizer."""

    def __init__(self, vocab_size: int = 512):
        self.vocab_size = vocab_size

    def __call__(self, texts, return_tensors="pt", padding="longest",
                 max_length: int = 256, truncation: bool = True):
        import torch
        from types import SimpleNamespace

        seqs = []
        for text in texts:
            toks = [
                int.from_bytes(
                    hashlib.sha256(w.encode()).digest()[:4], "little"
                ) % (self.vocab_size - 2) + 2
                for w in text.split()
            ]
            if truncation:
                toks = toks[: max_length - 1]
            seqs.append(toks + [1])  # </s>
        length = max(len(s) for s in seqs)
        input_ids = torch.zeros(len(seqs), length, dtype=torch.long)
        mask = torch.zeros(len(seqs), length, dtype=torch.long)
        for i, s in enumerate(seqs):
            input_ids[i, : len(s)] = torch.tensor(s)
            mask[i, : len(s)] = 1
        return SimpleNamespace(input_ids=input_ids, attention_mask=mask)


def _random_init_encoder(name: str):
    """A real (randomly initialised) HF ``T5EncoderModel`` + stand-in
    tokenizer, so the genuine encode path runs in offline images; swapping
    in pretrained weights requires no code change."""
    import torch
    from transformers import T5Config, T5EncoderModel

    torch.manual_seed(0)  # deterministic embeddings per process
    config = T5Config(
        vocab_size=512, d_model=get_encoded_dim(name), d_kv=32, d_ff=128,
        num_layers=2, num_heads=4, decoder_start_token_id=0,
    )
    model = T5EncoderModel(config)
    model.eval()
    return model, _WhitespaceTokenizer(config.vocab_size)


def _get_model_and_tokenizer(name: str, allow_random_init: bool = False):
    # a random-init fallback is cached under (name, random=True) only: a
    # later call WITHOUT allow_random_init must not silently receive random
    # weights — it either finds real pretrained weights or raises
    for key in ((name, False), (name, True)) if allow_random_init else (
            (name, False),):
        if key in _CACHE:
            return _CACHE[key]
    random_init = False
    try:
        from transformers import T5EncoderModel, T5Tokenizer

        tokenizer = T5Tokenizer.from_pretrained(name)
        model = T5EncoderModel.from_pretrained(name)
        model.eval()
    except Exception as e:  # no weights in this offline image
        if not allow_random_init:
            raise RuntimeError(
                f"could not load T5 '{name}' (offline image / no cached "
                f"weights): {e}. Pass allow_random_init=True for a "
                "randomly-initialised encoder, or use hash_text_encode."
            ) from e
        model, tokenizer = _random_init_encoder(name)
        random_init = True
    _CACHE[(name, random_init)] = (model, tokenizer)
    return _CACHE[(name, random_init)]


def t5_encode_text(
    texts: List[str],
    name: str = DEFAULT_T5_NAME,
    max_length: int = 256,
    return_attn_mask: bool = False,
    allow_random_init: bool = False,
):
    """Tokenize + encode text; masked positions zeroed (reference
    t5.py:107-119). ``allow_random_init`` runs the genuine HF encoder
    forward with random weights when pretrained ones can't be fetched."""
    import torch

    model, tokenizer = _get_model_and_tokenizer(
        name, allow_random_init=allow_random_init)
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
