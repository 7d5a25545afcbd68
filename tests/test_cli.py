"""CLI surface tests: reference flag semantics (llama2.ts:399-424, 514-524)."""

import pytest

from tpu_llama import cli


@pytest.fixture()
def model_files(tmp_path, tiny_weights, tiny_tokenizer):
    from tpu_llama.io.checkpoint import write_checkpoint

    ckpt = tmp_path / "model.bin"
    tok = tmp_path / "tokenizer.bin"
    write_checkpoint(ckpt, tiny_weights)
    tiny_tokenizer.save(tok)
    return str(ckpt), str(tok)


def run_cli(args):
    cli.main(args)


def test_missing_checkpoint_usage_exit(capsys):
    with pytest.raises(SystemExit) as e:
        run_cli([])
    assert e.value.code == 1
    assert "Usage:" in capsys.readouterr().err


@pytest.mark.parametrize("bad", [
    ["m.bin", "-t"],            # flag without value (llama2.ts:410)
    ["m.bin", "x", "1"],        # no dash (llama2.ts:412)
    ["m.bin", "-temp", "1"],    # not two chars (llama2.ts:413)
    ["m.bin", "-q", "1"],       # unknown flag (llama2.ts:421)
])
def test_strict_flag_pairs(bad, capsys):
    with pytest.raises(SystemExit) as e:
        run_cli(bad)
    assert e.value.code == 1


def test_generate_greedy(model_files, capsys, tiny_weights, tiny_tokenizer):
    ckpt, tok = model_files
    run_cli([ckpt, "--tokenizer", tok, "-t", "0", "-s", "1", "-n", "20",
             "-i", "Once upon a time", "--precision", "highest"])
    out = capsys.readouterr().out
    assert out.startswith("Once upon a time")
    assert "achieved tok/s:" in out  # llama2.ts:511 parity line

    # must match the oracle stream (the generate-loop contract)
    from tpu_llama.compat.generate import generate_compat
    from tpu_llama.compat.oracle import OracleState, oracle_forward

    c = tiny_weights.config
    st = OracleState.create(c)
    res = generate_compat(
        lambda t, p: oracle_forward(t, p, c, st, tiny_weights),
        tiny_tokenizer, prompt="Once upon a time", steps=20,
        temperature=0.0, seed=1, seq_len=c.seq_len)
    assert out.split("\n\nachieved tok/s")[0] == res.text


def test_generate_int8(model_files, capsys):
    ckpt, tok = model_files
    run_cli([ckpt, "--tokenizer", tok, "-t", "0", "-s", "1", "-n", "12",
             "-i", "On", "--quant", "int8"])
    out = capsys.readouterr().out
    assert out.startswith("On")


def test_steps_zero_uses_seq_len(model_files, capsys):
    """-n 0 -> run to seq_len (llama2.ts:439); just ensure it terminates and
    emits bounded output."""
    ckpt, tok = model_files
    run_cli([ckpt, "--tokenizer", tok, "-t", "0", "-s", "1", "-n", "0",
             "-i", "On"])
    out = capsys.readouterr().out
    assert "achieved tok/s:" in out


def test_kv_flags_and_sample_device(model_files, capsys):
    """--kv-dtype/--kv-layout/--sample-device are real (r1 advertised but
    unimplemented); paged int8 + device sampling still generates."""
    ckpt, tok = model_files
    run_cli([ckpt, "--tokenizer", tok, "-n", "12", "-i", "Once", "-t", "0",
             "-s", "1", "--kv-dtype", "int8", "--kv-layout", "paged",
             "--sample-device", "on"])
    out = capsys.readouterr().out
    assert "Once" in out and "achieved tok/s:" in out


def test_bad_kv_dtype_exits(model_files, capsys):
    ckpt, tok = model_files
    with pytest.raises(SystemExit):
        run_cli([ckpt, "--kv-dtype", "int4"])
