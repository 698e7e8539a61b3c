"""Tokenization goldens: GPT-2 BPE and WordPiece vs HF transformers
constructed from the same LOCAL vocab files (no hub), the GLM
command-token layer vs the actual reference Tokenizer, and the image
tokenizer + factory semantics."""

import json

import numpy as np
import pytest

from tests import refmods

torch = pytest.importorskip("torch")

SAMPLES = [
    "Hello world!",
    "  leading spaces and   runs",
    "don't stop: it's 2026, prices rose 3.5%!",
    "unicode naïve café ünïcode 汉字 test",
    "CamelCase hyphen-ated under_scored",
    "newline\nand\ttab",
]


# ---------------------------------------------------------------------------
# tiny local vocab artifacts
# ---------------------------------------------------------------------------
def _make_gpt2_files(tmp_path):
    """A miniature GPT-2 vocab: all 256 byte symbols + a few merges, so
    every string round-trips and the merges actually fire."""
    from scail_tpu.tokenization.text import bytes_to_unicode

    b2u = bytes_to_unicode()
    symbols = [b2u[i] for i in range(256)]
    merges = ["#version: 0.2"]
    sp = b2u[ord(" ")]
    for a, b in [("h", "e"), ("l", "l"), ("ll", "o"), ("w", "o"),
                 ("wo", "r"), ("wor", "l"), ("worl", "d"), ("t", "h"),
                 ("th", "e"), (sp, "t"), (sp + "t", "he")]:
        merges.append(f"{a} {b}")
        symbols.append(a + b)
    symbols += ["<|endoftext|>"]
    vocab = {s: i for i, s in enumerate(symbols)}
    vf, mf = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab))
    mf.write_text("\n".join(merges) + "\n")
    return str(vf), str(mf)


def _make_bert_vocab(tmp_path):
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words += list("abcdefghijklmnopqrstuvwxyz0123456789.,!?'-%:")
    words += ["hello", "world", "don", "stop", "it", "the", "##s", "##t",
              "##ed", "##ing", "##ld", "un", "##der", "test", "and",
              "new", "##line", "tab", "ca", "##fe", "naive", "prices",
              "rose", "汉", "字"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(words) + "\n")
    return str(vf)


def test_gpt2_bpe_golden_vs_hf(tmp_path):
    vf, mf = _make_gpt2_files(tmp_path)
    from transformers import GPT2Tokenizer

    from scail_tpu.tokenization.text import GPT2BPE

    hf = GPT2Tokenizer(vocab_file=vf, merges_file=mf)
    ours = GPT2BPE(vf, mf)
    for s in SAMPLES:
        want = hf.encode(s, add_special_tokens=False)
        got = ours.encode(s)
        assert got == want, s
        assert ours.decode(got) == hf.decode(want), s
    # byte-level: decode is an exact inverse on arbitrary text
    for s in SAMPLES:
        assert ours.decode(ours.encode(s)) == s


def test_wordpiece_golden_vs_hf(tmp_path):
    vf = _make_bert_vocab(tmp_path)
    from transformers import BertTokenizer

    from scail_tpu.tokenization.text import WordPiece

    hf = BertTokenizer(vocab_file=vf, do_lower_case=True)
    ours = WordPiece(vf, do_lower_case=True)
    for s in SAMPLES:
        want = hf.tokenize(s)
        got = ours.tokenize(s)
        assert got == want, s
        assert ours.encode(s) == hf.convert_tokens_to_ids(want), s


def test_glm_command_split_golden(tmp_path):
    """Our core.Tokenizer command splitting vs the actual reference
    Tokenizer (tokenization.py:142-368) composed over the SAME tiny BPE."""
    ref_tok_mod = refmods.import_ref("sat.tokenization.glm.tokenization")
    vf, mf = _make_gpt2_files(tmp_path)

    from scail_tpu.tokenization.core import CommandToken, Tokenizer
    from scail_tpu.tokenization.text import GPT2BPE

    bpe = GPT2BPE(vf, mf)
    cts = lambda mod: [
        mod("pad", "<|endoftext|>", bpe.encoder["<|endoftext|>"]),
        mod("eos", "<|endoftext|>", bpe.encoder["<|endoftext|>"]),
        mod("sop", "<|startofpiece|>", len(bpe)),
        mod("MASK", "[MASK]", len(bpe) + 1, True),  # lstrip
    ]

    class _RefGlue(ref_tok_mod.Tokenizer):
        def _encode(self, text):
            return self.text_tokenizer.encode(text)

        def _decode(self, ids):
            return self.text_tokenizer.decode(list(ids))

    class _Ours(Tokenizer):
        def _encode(self, text):
            return self.text_tokenizer.encode(text)

        def _decode(self, ids):
            return self.text_tokenizer.decode(list(ids))

    def ref_ct(name, token, Id, lstrip=False):
        return ref_tok_mod.CommandToken(name, token, Id, lstrip=lstrip)

    def our_ct(name, token, Id, lstrip=False):
        return CommandToken(name, token, Id, lstrip=lstrip)

    ref = _RefGlue(bpe, command_tokens=cts(ref_ct))
    ours = _Ours(bpe, cts(our_ct))

    cases = [
        "hello [MASK] world",
        "[MASK] leading",
        "trailing [MASK]",
        "a<|endoftext|>b<|startofpiece|>c",
        "no commands at all",
        "stacked [MASK] [MASK]<|endoftext|>",
        "spaces around   [MASK]   collapse left",
    ]
    for s in cases:
        want = ref.EncodeAsIds(s).tokenization
        got = ours.EncodeAsIds(s).tokenization
        assert got == want, s
        assert ours.DecodeIds(got) == ref.DecodeIds(want), s
        assert (ours.EncodeAsTokens(s).tokenization
                == ref.EncodeAsTokens(s).tokenization), s

    assert len(ours) == len(ref)
    assert ours.get_command("MASK").Id == ref.get_command("MASK").Id
    # Tokenization command attributes
    t = ours.EncodeAsIds("hello")
    assert t.MASK == len(bpe) + 1 and t.sop == len(bpe)


def test_glm_layouts_and_factory(tmp_path):
    """GLM command-token layouts (tokenization.py:370-427, 484-540) and
    the get_tokenizer cache/dispatch (sat/tokenization/__init__.py)."""
    vf, mf = _make_gpt2_files(tmp_path)
    bvf = _make_bert_vocab(tmp_path)

    from scail_tpu.tokenization import (BertWordPieceTokenizer,
                                        GPT2BPETokenizer, get_tokenizer)

    g = GPT2BPETokenizer(vf, mf, add_block_symbols=True, add_task_mask=True,
                         add_decoder_mask=True)
    n = len(g.text_tokenizer)
    assert g.get_command("sop").Id == n
    assert g.get_command("eop").Id == n + 1
    assert g.get_command("MASK").Id == n + 3
    assert g.get_command("gMASK").Id == n + 6
    assert g.get_command("dBLOCK").Id == n + 8
    assert g.get_command("eos").Id == g.text_tokenizer.encoder["<|endoftext|>"]

    b = BertWordPieceTokenizer(bvf, add_block_symbols=True,
                               add_task_mask=True)
    nb = len(b.text_tokenizer)
    assert b.get_command("pad").Id == b.text_tokenizer.vocab["[PAD]"]
    assert b.get_command("sop").Id == nb and b.get_command("gMASK").Id == nb + 2
    ids = b.EncodeAsIds("hello world [MASK] don't stop").tokenization
    assert b.get_command("MASK").Id in ids
    out = b.DecodeIds(ids)
    assert "hello world" in out and "[MASK]" in out
    # the reference's english cleanup joins "don ' t" -> "don't"
    assert "don'" in out

    # factory: fake -> None, cache by type, outer override
    assert get_tokenizer(args={"tokenizer_type": "fake"}) is None
    a = {"tokenizer_type": "glm_GPT2BPETokenizer", "vocab_file": vf,
         "merges_file": mf}
    t1 = get_tokenizer(args=a)
    assert get_tokenizer(args=a) is t1
    assert get_tokenizer() is t1
    sentinel = object()
    assert get_tokenizer(outer_tokenizer=sentinel) is sentinel
    with pytest.raises(ImportError):
        get_tokenizer(args={"tokenizer_type": "glm_ChineseSPTokenizer"})
    with pytest.raises(ValueError):
        get_tokenizer(args={"tokenizer_type": "nope"})


def test_image_tokenizer_roundtrip():
    """ImageTokenizer over a tiny VQModel: ids shape, code range, decode
    shape (vqvae_tokenizer.py:57-72)."""
    import jax

    from scail_tpu.autoencoding.vqgan import VQModel
    from scail_tpu.tokenization.image import ImageTokenizer, sqrt_int

    ddconfig = dict(z_channels=6, resolution=16, in_channels=3, out_ch=3,
                    ch=32, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[])
    model = VQModel(ddconfig, n_embed=24, embed_dim=6)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = ImageTokenizer(model, params)
    assert len(tok) == 24

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    ids = np.asarray(tok.EncodeAsIds(img, add_normalization=True))
    assert ids.shape == (2, 64)  # 8x8 grid
    assert ids.min() >= 0 and ids.max() < 24
    rec = np.asarray(tok.DecodeIds(ids[:1]))
    assert rec.shape == (1, 16, 16, 3) and np.all(np.isfinite(rec))
    assert sqrt_int(64) == 8
    with pytest.raises(AssertionError):
        sqrt_int(50)
