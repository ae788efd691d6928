"""CLI end-to-end (offline): quantize an HF checkpoint dir -> packed
checkpoint -> eval ppl -> benchmark."""

import numpy as np
import pytest

import hf_tiny


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hfmodel") / "opt-tiny"
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=64)
    model.save_pretrained(str(d))
    return str(d)


def test_quantize_cli_end_to_end(hf_dir, tmp_path, capsys):
    from owq_tpu.cli.quantize import main as qmain
    from owq_tpu.cli.eval import main as emain
    from owq_tpu.cli.benchmark import main as bmain

    ckpt = str(tmp_path / "ckpt")
    rc = qmain([hf_dir, "synthetic", "--wbits", "3", "--target_bit", "3.2",
                "--nsamples", "4", "--tuning", "minmax", "--seqlen", "32",
                "--save", ckpt, "--packing", "--fake", "--no-eval"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "packed model saved" in out

    rc = emain(["--load", ckpt, "--datasets", "synthetic", "--seqlen", "32",
                "--batch", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "synthetic:" in out
    ppl = float(out.strip().split()[-1])
    assert np.isfinite(ppl)

    rc = bmain(["--load", ckpt, "--tokens", "8"])
    assert rc == 0
    assert "tokens_per_s" in capsys.readouterr().out


def test_quantize_cli_nearest_and_fp16(hf_dir, capsys):
    from owq_tpu.cli.quantize import main as qmain

    # --nearest RTN path
    rc = qmain([hf_dir, "synthetic", "--wbits", "4", "--nearest",
                "--seqlen", "32", "--eval-datasets", "synthetic",
                "--eval-batch", "2"])
    assert rc == 0
    # wbits 16 = plain fp eval
    rc = qmain([hf_dir, "synthetic", "--seqlen", "32",
                "--eval-datasets", "synthetic", "--eval-batch", "2"])
    assert rc == 0


def test_cli_validation_errors(hf_dir):
    from owq_tpu.cli.quantize import main as qmain

    with pytest.raises(ValueError):
        qmain([hf_dir, "synthetic", "--wbits", "3", "--target_bit", "3.01",
               "--save", "x", "--seqlen", "32"])  # no --fake/--packing
    with pytest.raises(AssertionError):
        qmain([hf_dir, "synthetic", "--wbits", "3", "--target_bit", "4.5",
               "--seqlen", "32"])  # target_bit outside [wbits, wbits+1)


def test_quantize_eval_failure_still_saves(tmp_path, hf_dir):
    """An eval crash (e.g. unreachable dataset/tokenizer) must not lose the
    reconstruction when --save was requested."""
    from owq_tpu.cli.quantize import main as qmain

    ckpt = str(tmp_path / "q")
    rc = qmain([hf_dir, "synthetic", "--wbits", "3", "--target_bit", "3.2",
                "--nsamples", "2", "--seqlen", "32",
                "--eval-datasets", "wikitext2",   # needs HF: fails offline
                "--save", ckpt, "--packing"])
    assert rc == 0
    assert (tmp_path / "q" / "manifest.json").exists()
