"""spm_convert: first-party sentencepiece ModelProto parsing + HF tokenizer
construction, validated against handcrafted proto bytes (sentencepiece's
wheel is absent from this image — the converter exists precisely so released
``tokenizer.model`` artifacts load anyway)."""

import struct

import pytest

from a3vlm_tpu.tools.spm_convert import (
    BYTE,
    CONTROL,
    TYPE_BPE,
    TYPE_UNIGRAM,
    UNKNOWN,
    convert,
    parse_model_proto,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _piece(piece: str, score: float, ptype: int) -> bytes:
    body = _ld(1, piece.encode())
    body += _varint(2 << 3 | 5) + struct.pack("<f", score)
    body += _varint(3 << 3 | 0) + _varint(ptype)
    return _ld(1, body)


def _model_proto(pieces, model_type, add_dummy_prefix=True) -> bytes:
    out = b"".join(_piece(*p) for p in pieces)
    trainer = _varint(3 << 3 | 0) + _varint(model_type)
    out += _ld(2, trainer)
    norm = _varint(6 << 3 | 0) + _varint(1 if add_dummy_prefix else 0)
    out += _ld(3, norm)
    return out


PIECES = [
    ("<unk>", 0.0, UNKNOWN),
    ("<s>", 0.0, CONTROL),
    ("</s>", 0.0, CONTROL),
    ("▁", -2.0, 1),
    ("a", -1.0, 1),
    ("b", -1.1, 1),
    ("ab", -0.5, 1),
    ("▁ab", -0.4, 1),
    ("▁b", -1.2, 1),
]


def test_parse_model_proto_roundtrip():
    data = _model_proto(PIECES, TYPE_BPE)
    parsed = parse_model_proto(data)
    assert parsed["model_type"] == TYPE_BPE
    assert parsed["add_dummy_prefix"] is True
    assert [p[0] for p in parsed["pieces"]] == [p[0] for p in PIECES]
    assert parsed["pieces"][6][1] == pytest.approx(-0.5)
    assert parsed["pieces"][0][2] == UNKNOWN


@pytest.mark.parametrize("mtype", [TYPE_BPE, TYPE_UNIGRAM])
def test_convert_and_encode(tmp_path, mtype):
    from transformers import AutoTokenizer

    model = tmp_path / "tokenizer.model"
    model.write_bytes(_model_proto(PIECES, mtype))
    out = tmp_path / "hf"
    convert(str(model), str(out))
    tok = AutoTokenizer.from_pretrained(str(out))
    assert tok.bos_token == "<s>" and tok.eos_token == "</s>"
    # "ab b" -> with dummy prefix: "▁ab" + "▁b" (best merges/scores)
    ids = tok.encode("ab b", add_special_tokens=False)
    assert [tok.convert_ids_to_tokens(i) for i in ids] == ["▁ab", "▁b"]
    # decode strips the dummy prefix back off
    assert tok.decode(ids) == "ab b"


def test_tokenizer_auto_converts_spm(tmp_path):
    """a3vlm_tpu.Tokenizer transparently ingests a .model path without a
    sentencepiece install (tokenizer.py:24-44 parity surface)."""
    from a3vlm_tpu.tokenizer import Tokenizer

    model = tmp_path / "tokenizer.model"
    model.write_bytes(_model_proto(PIECES, TYPE_BPE))
    t = Tokenizer(str(model))
    assert t.tokenizer_type == "transformers"
    assert t.bos_id == 1 and t.eos_id == 2
    ids = t.encode("ab", bos=True, eos=True)
    assert ids[0] == 1 and ids[-1] == 2
    # conversion is cached next to the file
    assert (tmp_path / "tokenizer_hf" / "tokenizer.json").exists()


def test_byte_fallback_pieces(tmp_path):
    from transformers import AutoTokenizer

    pieces = PIECES + [(f"<0x{i:02X}>", 0.0, BYTE) for i in range(256)]
    model = tmp_path / "tokenizer.model"
    model.write_bytes(_model_proto(pieces, TYPE_BPE))
    out = tmp_path / "hf"
    convert(str(model), str(out))
    tok = AutoTokenizer.from_pretrained(str(out))
    # unseen char falls back to utf-8 byte pieces and decodes back
    ids = tok.encode("Ω", add_special_tokens=False)
    assert len(ids) >= 2
    assert tok.decode(ids) == "Ω"
