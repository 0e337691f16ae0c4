"""CLIP text tower + tokenizer: zero-shot weights from a raw checkpoint.

Closes the round-3 verdict gap: ``config_clip_openai.yaml`` points at a raw
OpenAI ``ViT-L-14.pt`` (vision+text); the zero-shot head must be computable
from it without any external service. Oracle: an INDEPENDENT torch-side
implementation (torch.nn.MultiheadAttention for the causal blocks) run on a
tiny synthetic CLIP text tower with shared weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from robustart_tpu.models.clip_text import (  # noqa: E402
    OPENAI_IMAGENET_TEMPLATES,
    SimpleTokenizer,
    compute_zero_shot_weights,
    encode_text,
    tokenize,
    _text_params,
)

WIDTH, HEADS, DEPTH, CTX, EMBED = 32, 4, 2, 16, 24


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


@pytest.fixture()
def tiny_bpe(tmp_path):
    # header line + a few merges exercising mid-word and </w> merges
    merges = [
        "#version: tiny",
        "h e",
        "l l",
        "he ll",
        "o</w> o</w>",  # never matches (no doubled 'o o' pair) — rank noise
        "hell o</w>",
        "a</w> a</w>",
    ]
    p = tmp_path / "bpe.txt"
    p.write_text("\n".join(merges) + "\n")
    return SimpleTokenizer(str(p), n_merges=None)


def test_bpe_merge_order(tiny_bpe):
    # 'hello' → h e l l o</w> → (h e) → (l l) → (he ll) → (hell o</w>)
    assert tiny_bpe.bpe("hello") == "hello</w>"
    # 'hell' → h e l l</w>: 'll</w>' is NOT in the merge table ('l l' is
    # the no-</w> pair), so only (h e) applies
    assert tiny_bpe.bpe("hell") == "he l l</w>"
    # unknown word falls back to characters + </w>
    assert tiny_bpe.bpe("xy") == "x y</w>"


def test_encode_and_tokenize(tiny_bpe):
    ids = tiny_bpe.encode("hello hello")
    tok = tiny_bpe.encoder["hello</w>"]
    assert ids == [tok, tok]
    arr = tokenize(["hello", "hello hello"], tiny_bpe, context_length=6)
    sot, eot = (tiny_bpe.encoder["<|startoftext|>"],
                tiny_bpe.encoder["<|endoftext|>"])
    assert arr.shape == (2, 6)
    assert list(arr[0][:3]) == [sot, tok, eot] and arr[0][3:].sum() == 0
    assert list(arr[1][:4]) == [sot, tok, tok, eot]


def test_tokenize_truncates_keeping_eot(tiny_bpe):
    arr = tokenize(["hello " * 20], tiny_bpe, context_length=6)
    eot = tiny_bpe.encoder["<|endoftext|>"]
    assert arr.shape == (1, 6) and arr[0, -1] == eot


def test_lowercase_and_whitespace_clean(tiny_bpe):
    assert tiny_bpe.encode("  HeLLo \n hello ") == tiny_bpe.encode(
        "hello hello"
    )


def test_templates_are_the_80_prompt_ensemble():
    assert len(OPENAI_IMAGENET_TEMPLATES) == 80
    assert len(set(OPENAI_IMAGENET_TEMPLATES)) == 80
    assert all("{}" in t for t in OPENAI_IMAGENET_TEMPLATES)


# ---------------------------------------------------------------------------
# text transformer vs torch oracle
# ---------------------------------------------------------------------------


class TorchCLIPText(nn.Module):
    """Independent torch implementation of the CLIP text tower (causal
    multi-head attention via nn.MultiheadAttention, quick-gelu MLPs)."""

    def __init__(self, vocab):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, WIDTH)
        self.positional_embedding = nn.Parameter(
            torch.randn(CTX, WIDTH) * 0.02
        )
        self.blocks = nn.ModuleList()
        for _ in range(DEPTH):
            blk = nn.ModuleDict({
                "ln_1": nn.LayerNorm(WIDTH),
                "attn": nn.MultiheadAttention(WIDTH, HEADS,
                                              batch_first=True),
                "ln_2": nn.LayerNorm(WIDTH),
                "c_fc": nn.Linear(WIDTH, WIDTH * 4),
                "c_proj": nn.Linear(WIDTH * 4, WIDTH),
            })
            self.blocks.append(blk)
        self.ln_final = nn.LayerNorm(WIDTH)
        self.text_projection = nn.Parameter(torch.randn(WIDTH, EMBED) * 0.05)

    def forward(self, tokens):
        mask = torch.full((CTX, CTX), float("-inf")).triu(1)
        x = self.token_embedding(tokens) + self.positional_embedding
        for blk in self.blocks:
            y = blk["ln_1"](x)
            a, _ = blk["attn"](y, y, y, attn_mask=mask, need_weights=False)
            x = x + a
            y = blk["ln_2"](x)
            h = blk["c_fc"](y)
            h = h * torch.sigmoid(1.702 * h)  # quick-gelu
            x = x + blk["c_proj"](h)
        x = self.ln_final(x)
        eot = tokens.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ self.text_projection


def _state_dict_from_torch(net) -> dict:
    """Emit the OpenAI CLIP state_dict key layout from the torch oracle."""
    sd = {
        "token_embedding.weight":
            net.token_embedding.weight.detach().numpy(),
        "positional_embedding":
            net.positional_embedding.detach().numpy(),
        "ln_final.weight": net.ln_final.weight.detach().numpy(),
        "ln_final.bias": net.ln_final.bias.detach().numpy(),
        "text_projection": net.text_projection.detach().numpy(),
    }
    for i, blk in enumerate(net.blocks):
        p = f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = blk["ln_1"].weight.detach().numpy()
        sd[p + "ln_1.bias"] = blk["ln_1"].bias.detach().numpy()
        sd[p + "attn.in_proj_weight"] = (
            blk["attn"].in_proj_weight.detach().numpy()
        )
        sd[p + "attn.in_proj_bias"] = (
            blk["attn"].in_proj_bias.detach().numpy()
        )
        sd[p + "attn.out_proj.weight"] = (
            blk["attn"].out_proj.weight.detach().numpy()
        )
        sd[p + "attn.out_proj.bias"] = (
            blk["attn"].out_proj.bias.detach().numpy()
        )
        sd[p + "ln_2.weight"] = blk["ln_2"].weight.detach().numpy()
        sd[p + "ln_2.bias"] = blk["ln_2"].bias.detach().numpy()
        sd[p + "mlp.c_fc.weight"] = blk["c_fc"].weight.detach().numpy()
        sd[p + "mlp.c_fc.bias"] = blk["c_fc"].bias.detach().numpy()
        sd[p + "mlp.c_proj.weight"] = blk["c_proj"].weight.detach().numpy()
        sd[p + "mlp.c_proj.bias"] = blk["c_proj"].bias.detach().numpy()
    return sd


@pytest.fixture(scope="module")
def torch_text():
    torch.manual_seed(0)
    net = TorchCLIPText(vocab=64)
    net.eval()
    return net


def test_encode_text_matches_torch_oracle(torch_text):
    rng = np.random.default_rng(0)
    tokens = np.zeros((5, CTX), np.int32)
    for i in range(5):
        n = int(rng.integers(3, CTX))
        tokens[i, :n] = rng.integers(1, 60, n)
        tokens[i, n - 1] = 63  # EOT = largest id, at the sequence end
    with torch.no_grad():
        want = torch_text(torch.tensor(tokens, dtype=torch.long)).numpy()
    sd = _state_dict_from_torch(torch_text)
    got = np.asarray(
        encode_text(_text_params(sd), tokens, num_heads=HEADS)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_zero_shot_weights_match_torch_recipe(torch_text, tmp_path):
    """End-to-end: tokenizer + text tower + the normalize/average/normalize
    recipe vs the same computed torch-side (the OpenAI zeroshot_classifier
    protocol)."""
    merges = ["#v", "c a", "ca t</w>", "d o", "do g</w>"]
    p = tmp_path / "bpe.txt"
    p.write_text("\n".join(merges) + "\n")
    tk = SimpleTokenizer(str(p), n_merges=None)
    vocab = len(tk.encoder)

    torch.manual_seed(1)
    net = TorchCLIPText(vocab=vocab)
    net.eval()
    sd = _state_dict_from_torch(net)

    classnames = ["cat", "dog"]
    templates = ("a photo of a {}.", "a drawing of a {}.")
    got = compute_zero_shot_weights(
        sd, classnames, templates=templates, tokenizer=tk, num_heads=HEADS,
    )
    assert got.shape == (EMBED, 2)

    # torch-side oracle of the full recipe
    cols = []
    for name in classnames:
        toks = tokenize([t.format(name) for t in templates], tk,
                        context_length=CTX)
        with torch.no_grad():
            f = net(torch.tensor(toks, dtype=torch.long))
        f = f / f.norm(dim=-1, keepdim=True)
        m = f.mean(0)
        cols.append((m / m.norm()).numpy())
    want = np.stack(cols, 1)
    np.testing.assert_allclose(got, want, atol=3e-5)
    # columns are unit-norm (the vision head re-normalizes defensively,
    # but the stored weights should already be normalized)
    np.testing.assert_allclose(np.linalg.norm(got, axis=0), 1.0, atol=1e-5)


def test_load_torch_checkpoint_builds_zero_shot_head(torch_text, tmp_path):
    """Config-path integration: a raw .pt with a text tower +
    ``saver.pretrain.clip_zero_shot: {classnames, bpe}`` yields variables
    whose zero_shot_weights equal the direct computation (the knob the
    reference's config_clip_openai.yaml flow needs to be self-sufficient)."""
    from robustart_tpu.models import create_classifier
    from robustart_tpu.models.torch_convert import load_torch_checkpoint

    merges = ["#v", "c a", "ca t</w>", "d o", "do g</w>"]
    bpe = tmp_path / "bpe.txt"
    bpe.write_text("\n".join(merges) + "\n")
    names = tmp_path / "classes.txt"
    names.write_text("cat\ndog\n")

    sd = _state_dict_from_torch(torch_text)
    ckpt = tmp_path / "tiny_clip.pt"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, str(ckpt))

    clf = create_classifier(
        "clip_vit_l_14", rng=0, input_size=16, num_classes=2,
        patch_size=8, width=WIDTH, depth=1, num_heads=HEADS,
        embed_dim=EMBED,
    )
    variables = load_torch_checkpoint(
        str(ckpt), clf,
        clip_zero_shot={"classnames": str(names), "bpe": str(bpe),
                        "num_heads": HEADS},
    )
    got = np.asarray(variables["params"]["zero_shot_weights"])

    tk = SimpleTokenizer(str(bpe), n_merges=None)
    want = compute_zero_shot_weights(
        sd, ["cat", "dog"], tokenizer=tk, num_heads=HEADS,
    )
    np.testing.assert_allclose(got, want, atol=1e-6)

    # precomputed-npz path produces the same head
    npz = tmp_path / "zs.npz"
    np.savez(npz, zero_shot_weights=want)
    variables2 = load_torch_checkpoint(
        str(ckpt), clf, clip_zero_shot={"weights": str(npz)},
    )
    np.testing.assert_allclose(
        np.asarray(variables2["params"]["zero_shot_weights"]), want,
        atol=0,
    )
