"""Grammar-constrained decoding: the char DFA must accept exactly the
codec byte formats, the token lift must stay live under a real BPE
tokenizer, and a constrained Generator must emit grammar-valid triads
from a model that produces garbage unconstrained."""

import jax
import numpy as np
import pytest

from a3vlm_tpu import constrained as C
from a3vlm_tpu.codecs import triad as T
from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.generation import Generator
from a3vlm_tpu.models import llama


def test_char_dfa_combinators():
    d = C.CharDfa(C.Seq(C.Lit("ab"), C.Star(C.Cls("xy")), C.Lit("c")))
    assert d.matches("abc")
    assert d.matches("abxyxc")
    assert not d.matches("abzc")
    assert not d.matches("ab")
    # negated class: anything but '<' (incl. chars outside the alphabet)
    d2 = C.CharDfa(C.Seq(C.Plus(C.Cls("<", negate=True)), C.Lit("<end>")))
    assert d2.matches("door_7%$ é<end>")
    assert not d2.matches("<end>")
    # bounded repetition
    d3 = C.CharDfa(C.Rep(C.Cls("0123456789"), 2, 3))
    assert not d3.matches("1")
    assert d3.matches("12") and d3.matches("123")
    assert not d3.matches("1234")


def test_char_dfa_accepts_codec_formats():
    box = T.format_rotated_box([480, 480, 100, 50, -1.23])
    assert C.CharDfa(C.rotated_box_grammar()).matches(box)
    assert not C.CharDfa(C.rotated_box_grammar()).matches(box[:-1])
    ja = T.format_joint_answer("revolute", box)
    assert C.CharDfa(C.joint_rec_grammar()).matches(ja)
    items = [
        {"bbox": [480, 480, 100, 50, 0.5], "link_name": "door"},
        {"bbox": [100, 200, 30, 40, -0.25], "link_name": "drawer_front"},
    ]
    assert C.CharDfa(C.det_all_grammar()).matches(
        T.det_all_rotated_answer(items)
    )
    ax = T.format_axis_answer(
        "prismatic", "[[0.10,0.20,0.30],[0.40,0.50,0.60]]"
    )
    assert C.CharDfa(C.axis_3d_grammar()).matches(ax)


def test_compile_grammar_token_walk(tiny_tokenizer):
    tok = tiny_tokenizer
    fsm = C.compile_grammar(C.joint_rec_grammar(), tok)
    # no '-': the tiny fixture tokenizer's corpus can't spell minus (it
    # maps to <unk>, which the FSM rightly forbids)
    ans = "<rb>revolute</rb>[0.50,0.50,0.10,0.05,1.23]"
    s = 0
    for i in tok.encode(ans, bos=False, eos=False):
        ns = int(fsm.next_state[s, i])
        assert ns >= 0, (s, i, tok.id_to_piece(i))
        s = ns
    # EOS legal exactly at the accepting end, not mid-answer
    assert fsm.next_state[s, tok.eos_id] == s
    assert fsm.next_state[0, tok.eos_id] == -1


def test_fsm_for_task_routing(tiny_tokenizer):
    assert C.fsm_for_task("plain_qa_tasks_Box", tiny_tokenizer) is None
    f1 = C.fsm_for_task("single_link_rec_tasks_Box", tiny_tokenizer)
    f2 = C.fsm_for_task("single_link_rec_tasks_Oven", tiny_tokenizer)
    assert f1 is not None and f1 is f2  # cached per (family, tokenizer)


@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_generator_constrained_output_parses(tiny_tokenizer, temperature):
    """A content-free random model emits garbage unconstrained; with the
    FSM every generation is a complete, parseable joint answer."""
    tok = tiny_tokenizer
    vocab = -(-tok.n_words // 128) * 128
    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=vocab,
        multiple_of=16, max_seq_len=160, max_batch_size=3,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(3), args)
    gen = Generator(params, args, tok, vocab_limit=tok.n_words)
    prompts = [
        "### Human: provide the joint's type and its 2D rotated bounding box",
        "detect the drawer",
        "the answer is",
    ]
    fsm = C.compile_grammar(C.joint_rec_grammar(), tok)
    outs = gen.generate(
        prompts, max_gen_len=64, temperature=temperature, fsm=fsm
    )
    dfa = C.CharDfa(C.Seq(C.Opt(C.Lit(" ")), C.joint_rec_grammar()))
    for o in outs:
        assert dfa.matches(o), repr(o)
        box = T.parse_rotated_box(o.split("</rb>")[1].strip())
        assert box is not None and len(box) == 5
    # sanity: the same model unconstrained does NOT emit valid answers
    free = gen.generate(prompts, max_gen_len=64, temperature=0.0)
    assert not all(dfa.matches(o) for o in free)
