"""CLIP text transformer + BPE tokenizer: zero-shot head from a raw ckpt.

The reference evaluates ``clip_vit_l_14`` from a raw OpenAI checkpoint
(``/root/reference/exprs/exp/imagenet-a_o-loop/config_clip_openai.yaml`` —
``saver.pretrain.path: ViT-L-14.pt``) through its missing prototype zoo,
which computed the zero-shot classification weights from class-prompt text
embeddings. This module makes that self-sufficient here: the OpenAI ``.pt``
carries BOTH towers, so ``compute_zero_shot_weights`` runs the TEXT tower
over the standard 80-prompt ImageNet ensemble and produces the
``zero_shot_weights`` param the vision classifier consumes
(models/clip_vit.py zero-shot head).

Pieces (all faithful to openai/CLIP's public model.py / clip.py /
simple_tokenizer.py semantics, reimplemented in JAX/numpy):

- :class:`SimpleTokenizer` — byte-level BPE. The merges file
  (``bpe_simple_vocab_16e6.txt.gz``) is NOT inside the ``.pt`` and cannot
  be downloaded here (zero egress); pass its path when available, or pass
  pre-tokenized ids to :func:`compute_zero_shot_weights`.
- :func:`encode_text` — token embedding + positional + causal-mask
  transformer (quick-gelu MLPs) + ln_final + EOT-position projection.
  Consumes the torch state_dict tensors directly (no layout conversion
  pass needed: this is a one-shot conversion-time tool, not a serving
  path).
- :func:`compute_zero_shot_weights` — per class: embed every prompt,
  L2-normalize, average, L2-normalize again (the OpenAI zeroshot_classifier
  recipe); returns (embed_dim, n_classes) float32.

This is conversion-time tooling: it runs once per checkpoint (host or
chip, batched over prompts) and stores the result into the converted
variables; the serving path stays the pure vision tower.
"""

from __future__ import annotations

import gzip
import html
import re
from functools import lru_cache
from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# The standard 80-template ImageNet prompt ensemble
# (openai/CLIP notebooks/Prompt_Engineering_for_ImageNet.ipynb — public
# constants, the reference's zero-shot protocol).
OPENAI_IMAGENET_TEMPLATES = (
    "a bad photo of a {}.", "a photo of many {}.",
    "a sculpture of a {}.", "a photo of the hard to see {}.",
    "a low resolution photo of the {}.", "a rendering of a {}.",
    "graffiti of a {}.", "a bad photo of the {}.",
    "a cropped photo of the {}.", "a tattoo of a {}.",
    "the embroidered {}.", "a photo of a hard to see {}.",
    "a bright photo of a {}.", "a photo of a clean {}.",
    "a photo of a dirty {}.", "a dark photo of the {}.",
    "a drawing of a {}.", "a photo of my {}.",
    "the plastic {}.", "a photo of the cool {}.",
    "a close-up photo of a {}.", "a black and white photo of the {}.",
    "a painting of the {}.", "a painting of a {}.",
    "a pixelated photo of the {}.", "a sculpture of the {}.",
    "a bright photo of the {}.", "a cropped photo of a {}.",
    "a plastic {}.", "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.", "a blurry photo of the {}.",
    "a photo of the {}.", "a good photo of the {}.",
    "a rendering of the {}.", "a {} in a video game.",
    "a photo of one {}.", "a doodle of a {}.",
    "a close-up photo of the {}.", "a photo of a {}.",
    "the origami {}.", "the {} in a video game.",
    "a sketch of a {}.", "a doodle of the {}.",
    "a origami {}.", "a low resolution photo of a {}.",
    "the toy {}.", "a rendition of the {}.",
    "a photo of the clean {}.", "a photo of a large {}.",
    "a rendition of a {}.", "a photo of a nice {}.",
    "a photo of a weird {}.", "a blurry photo of a {}.",
    "a cartoon {}.", "art of a {}.",
    "a sketch of the {}.", "a embroidered {}.",
    "a pixelated photo of a {}.", "itap of the {}.",
    "a jpeg corrupted photo of the {}.", "a good photo of a {}.",
    "a plushie {}.", "a photo of the nice {}.",
    "a photo of the small {}.", "a photo of the weird {}.",
    "the cartoon {}.", "art of the {}.",
    "a drawing of the {}.", "a photo of the large {}.",
    "a black and white photo of a {}.", "the plushie {}.",
    "a dark photo of a {}.", "itap of a {}.",
    "graffiti of the {}.", "a toy {}.",
    "itap of my {}.", "a photo of a cool {}.",
    "a photo of a small {}.", "a tattoo of the {}.",
)


# ---------------------------------------------------------------------------
# BPE tokenizer (openai/CLIP simple_tokenizer.py semantics)
# ---------------------------------------------------------------------------


@lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """Reversible byte → printable-unicode map (avoids control chars)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word[:-1], word[1:]))


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """Byte-level BPE with the CLIP merge table.

    ``bpe_path``: the standard ``bpe_simple_vocab_16e6.txt.gz`` (or an
    uncompressed/truncated merge list for tests). The vocabulary is
    byte-alphabet + byte-alphabet</w> + one token per merge +
    <|startoftext|>/<|endoftext|> — for the full file that is the familiar
    49408.
    """

    def __init__(self, bpe_path: str, n_merges: int | None = 48894):
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        # line 0 is a version header in the shipped file; merge list is
        # then capped to the CLIP vocab budget (simple_tokenizer.py:64)
        merges = merges[1 : (n_merges + 1) if n_merges else None]
        merges = [tuple(m.split()) for m in merges if m.strip()]
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        # the upstream pattern uses \p{L}/\p{N} via the `regex` module
        # (absent here); for the ascii prompt ensemble this equivalent
        # matches identically
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE,
        )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        bpe_tokens: list[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ")
            )
        return bpe_tokens


def tokenize(
    texts: str | Sequence[str],
    tokenizer: SimpleTokenizer,
    context_length: int = 77,
) -> np.ndarray:
    """(n, context_length) int32 with <|startoftext|> ... <|endoftext|> pads
    of 0 (clip.py:tokenize; truncates overflow keeping the EOT)."""
    if isinstance(texts, str):
        texts = [texts]
    sot = tokenizer.encoder["<|startoftext|>"]
    eot = tokenizer.encoder["<|endoftext|>"]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        toks = [sot] + tokenizer.encode(text) + [eot]
        if len(toks) > context_length:
            toks = toks[: context_length - 1] + [eot]
        result[i, : len(toks)] = toks
    return result


# ---------------------------------------------------------------------------
# Text transformer forward (openai/CLIP model.py encode_text semantics)
# ---------------------------------------------------------------------------


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _text_params(state_dict: dict[str, np.ndarray]) -> dict[str, Any]:
    """Pull the text tower out of an OpenAI CLIP state_dict (numpy).

    Accepts both raw torch keys (``attn.in_proj_weight``) and the dotted
    form read_torch_state_dict normalizes to (``attn.in_proj.weight``).
    """
    sd = {
        k.replace("in_proj.weight", "in_proj_weight")
         .replace("in_proj.bias", "in_proj_bias"): np.asarray(v)
        for k, v in state_dict.items()
    }
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k))
    )
    blocks = []
    for i in range(depth):
        p = f"transformer.resblocks.{i}."
        blocks.append({
            "ln_1_w": sd[p + "ln_1.weight"], "ln_1_b": sd[p + "ln_1.bias"],
            # torch in_proj rows are [q; k; v] each (width, width): keep
            # that packing, transpose to (width, 3·width) column-major
            "qkv_w": sd[p + "attn.in_proj_weight"].T,
            "qkv_b": sd[p + "attn.in_proj_bias"],
            "out_w": sd[p + "attn.out_proj.weight"].T,
            "out_b": sd[p + "attn.out_proj.bias"],
            "ln_2_w": sd[p + "ln_2.weight"], "ln_2_b": sd[p + "ln_2.bias"],
            "fc_w": sd[p + "mlp.c_fc.weight"].T,
            "fc_b": sd[p + "mlp.c_fc.bias"],
            "proj_w": sd[p + "mlp.c_proj.weight"].T,
            "proj_b": sd[p + "mlp.c_proj.bias"],
        })
    return {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "blocks": blocks,
        "ln_final_w": sd["ln_final.weight"],
        "ln_final_b": sd["ln_final.bias"],
        "text_projection": sd["text_projection"],
        "heads": max(1, sd["token_embedding.weight"].shape[1] // 64),
    }


def encode_text(
    params: dict[str, Any], tokens: np.ndarray, num_heads: int | None = None
) -> jax.Array:
    """(n, context) int tokens → (n, embed_dim) float32 text features.

    Causal-mask multi-head attention, quick-gelu MLPs, features taken at
    the EOT position (= argmax over token ids, EOT being the largest id).
    """
    width = params["token_embedding"].shape[1]
    heads = num_heads or params.get("heads")
    d = width // heads
    n_ctx = tokens.shape[1]
    mask = jnp.triu(jnp.full((n_ctx, n_ctx), -jnp.inf, jnp.float32), k=1)

    x = jnp.asarray(params["token_embedding"])[jnp.asarray(tokens)]
    x = x + jnp.asarray(params["positional_embedding"])[:n_ctx]
    for blk in params["blocks"]:
        y = _ln(x, blk["ln_1_w"], blk["ln_1_b"])
        qkv = y @ blk["qkv_w"] + blk["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], n_ctx, heads, d)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        att = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(d), k) + mask
        att = jax.nn.softmax(att, -1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v)
        o = o.reshape(o.shape[0], n_ctx, width)
        x = x + (o @ blk["out_w"] + blk["out_b"])
        y = _ln(x, blk["ln_2_w"], blk["ln_2_b"])
        h = _quick_gelu(y @ blk["fc_w"] + blk["fc_b"])
        x = x + (h @ blk["proj_w"] + blk["proj_b"])
    x = _ln(x, params["ln_final_w"], params["ln_final_b"])
    eot = jnp.argmax(jnp.asarray(tokens), -1)
    feats = x[jnp.arange(x.shape[0]), eot] @ jnp.asarray(
        params["text_projection"], jnp.float32
    )
    return feats


def compute_zero_shot_weights(
    state_dict: dict[str, np.ndarray],
    classnames: Sequence[str] | None = None,
    *,
    templates: Iterable[str] = OPENAI_IMAGENET_TEMPLATES,
    tokenizer: SimpleTokenizer | None = None,
    num_heads: int | None = None,
    class_tokens: Sequence[np.ndarray] | None = None,
) -> np.ndarray:
    """(embed_dim, n_classes) zero-shot weights from a raw CLIP state_dict.

    Per class: embed every template prompt, L2-normalize each embedding,
    average, L2-normalize the mean (openai/CLIP zeroshot_classifier).
    Supply either ``classnames`` + ``tokenizer`` (needs the BPE merges
    file) or ``class_tokens``: a list of pre-tokenized (n_prompts, 77)
    arrays — the zero-egress fallback.
    """
    params = _text_params(state_dict)
    templates = tuple(templates)
    if class_tokens is None:
        if classnames is None or tokenizer is None:
            raise ValueError(
                "pass classnames+tokenizer, or pre-tokenized class_tokens"
            )
        # context length follows the checkpoint's positional table
        ctx = int(params["positional_embedding"].shape[0])
        class_tokens = [
            tokenize([t.format(name) for t in templates], tokenizer,
                     context_length=ctx)
            for name in classnames
        ]

    # params ride as jit ARGUMENTS — closed-over weights get baked into the
    # compile payload, which the axon relay caps (HTTP 413, CLAUDE.md);
    # head count is static (it shapes the reshape)
    heads = int(num_heads or params.pop("heads"))
    params.pop("heads", None)
    enc = jax.jit(encode_text, static_argnums=2)
    cols = []
    for toks in class_tokens:
        feats = np.asarray(enc(params, np.asarray(toks, np.int32), heads))
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        mean = feats.mean(0)
        cols.append(mean / np.linalg.norm(mean))
    return np.stack(cols, axis=1).astype(np.float32)
