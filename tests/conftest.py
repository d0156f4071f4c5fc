"""Test config: run everything on a virtual 8-device CPU mesh so every
parallelism mode (DP/TP shardings, collectives, resharding) gets real
multi-device coverage without hardware — the strategy SURVEY.md §4 calls for.

This environment may boot python with a TPU PJRT plugin (axon sitecustomize)
that sets ``jax_platforms`` via jax.config — which overrides the env var — so
we force the config back to CPU here, before any backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f32 matmuls in tests should be exact, not TPU-style bf16-reduced
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs


@pytest.fixture(scope="session")
def tiny_tokenizer_dir(tmp_path_factory):
    """Train a tiny LLaMA-ish BPE tokenizer offline (no network) and save it
    as an HF tokenizer dir."""
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [
        "A chat between a curious human and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the human's questions.",
        "### Human: Assistant: please provide the joint's type and its 2D "
        "rotated bounding box linked to the object part door drawer lid",
        "<rb>revolute</rb><rbd></rbd><box></box><axis>prismatic</axis>",
        "[0.12,0.34,0.56,0.78,0.90] the answer is Opened Closed",
        "0123456789 .,[]<>/# Hi my darling detect all manipulable object "
        "parts and provide their rotated bounding boxes",
        "There are two manipulable object parts with their 3d bounding "
        "boxes slide_open flap_close StatusComplete",
    ] * 50
    tok = HFTok(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    trainer = trainers.BpeTrainer(
        vocab_size=800, special_tokens=["<unk>", "<s>", "</s>"]
    )
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
    )
    d = tmp_path_factory.mktemp("tok")
    fast.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="session")
def tiny_tokenizer(tiny_tokenizer_dir):
    from a3vlm_tpu.tokenizer import Tokenizer

    return Tokenizer(tiny_tokenizer_dir)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Free each module's compiled executables when it finishes. The suite
    grew enough (round 5: 3D accuracy-gate training, CB TP exactness
    twins, W8A8 kernels) that XLA:CPU began segfaulting in late-module
    COMPILES under the accumulated jit-cache footprint (3/3 full-suite
    runs, 2 distinct old tests, always inside backend_compile; every
    crashing test passes standalone). Dropping caches per module keeps
    peak state bounded; recompiles only cost time."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
