"""Every scripts/*.sh invokes a CLI config path that actually parses.

The reference's `scripts/` tree is its experiment store (SURVEY L6): each
script encodes one published hyperparameter configuration. These tests keep
the 23-script surface honest — bash syntax-checked, and every
``python -m rlcf_tpu.cli.<entry> ...`` line re-parsed by that entry's real
argparse parser (catching renamed/removed/typo'd flags and illegal choices)
— plus an execution smoke of the KD retrieval loss path the KD scripts use.
"""

import glob
import importlib
import os
import re
import shlex
import subprocess

import pytest

SCRIPTS_DIR = os.path.join(os.path.dirname(__file__), "..", "scripts")
SCRIPTS = sorted(glob.glob(os.path.join(SCRIPTS_DIR, "*.sh")))

REFERENCE_SCRIPT_COUNT = 23  # 7 TPT + 5 retrieval + 11 caption


def test_script_surface_complete():
    assert len(SCRIPTS) == REFERENCE_SCRIPT_COUNT, sorted(os.path.basename(s) for s in SCRIPTS)


@pytest.mark.parametrize("script", SCRIPTS, ids=[os.path.basename(s) for s in SCRIPTS])
def test_script_bash_syntax(script):
    subprocess.run(["bash", "-n", script], check=True)


def _extract_cli_invocations(text):
    """Yield (module, argv) for each ``python -m rlcf_tpu.cli.X ...`` command."""
    # join line continuations
    text = text.replace("\\\n", " ")
    # collect simple shell variable defaults: name=value, name=${N:-default}
    env = {}
    for line in text.splitlines():
        m = re.match(r"^(\w+)=(\S+)", line.strip())  # first token; ignores trailing comments
        if not m:
            continue
        name, val = m.groups()
        d = re.match(r"^\$\{\d+:-(.*)\}$", val) or re.match(r"^\$\{\d+:\?.*\}$", val)
        if d:
            val = d.group(1) if d.lastindex else "DUMMY"
        env[name] = val.strip('"') or "DUMMY"

    def sub_var(m):
        return env.get(m.group(1), "DUMMY")

    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"python -m (rlcf_tpu\.cli\.\w+)\s+(.*)", line)
        if not m:
            continue
        module, rest = m.group(1), m.group(2)
        # ${var:+--flag "$var"} -> keep the inner expansion
        rest = re.sub(r"\$\{[A-Za-z_]\w*:\+([^}]*)\}", r"\1", rest)
        # ${VAR:-}/${VAR:?...} -> default-or-dummy; $var -> script default or dummy
        rest = re.sub(r"\$\{(\w+)[:+?-][^}]*\}", sub_var, rest)
        rest = re.sub(r"\$\{(\w+)\}", sub_var, rest)
        rest = re.sub(r"\$(\w+)", sub_var, rest)
        argv = shlex.split(rest)
        yield module, argv


@pytest.mark.parametrize("script", SCRIPTS, ids=[os.path.basename(s) for s in SCRIPTS])
def test_script_flags_parse(script):
    with open(script) as fh:
        text = fh.read()
    invocations = list(_extract_cli_invocations(text))
    assert invocations, f"{script} contains no rlcf_tpu CLI invocation"
    for module, argv in invocations:
        mod = importlib.import_module(module)
        args = mod.get_args(argv)  # SystemExit on unknown flag / bad choice
        assert args is not None


def test_retrieval_kd_loss_smoke(tmp_path):
    """The KD scripts' --loss kd path runs end to end (synthetic gallery)."""
    from rlcf_tpu.cli import tta_retrieval

    r = tta_retrieval.main(
        ["--synthetic", "--arch", "test-small", "--reward_arch", "test-small",
         "--precision", "fp32", "--resolution", "64", "--loss", "kd",
         "--tta_steps", "1", "--group_size", "2",
         "--sample_k_t2i", "2", "--sample_k_i2t", "3",
         "--output", str(tmp_path)]
    )
    assert set(r) >= {"txt_r1", "img_r1", "r_mean"}


RUNBOOK = os.path.join(SCRIPTS_DIR, "..", "RUNBOOK.md")


def _runbook_invocations():
    """Every ``python -m rlcf_tpu.cli.X`` line in RUNBOOK.md, with shell vars
    ($DATA/$CKPT/...) replaced by dummy paths."""
    with open(RUNBOOK) as fh:
        text = fh.read()
    return list(_extract_cli_invocations(text))


def test_runbook_has_cli_commands():
    assert len(_runbook_invocations()) >= 1  # at least the zero-shot gate


@pytest.mark.parametrize(
    "module,argv",
    _runbook_invocations(),
    ids=[m.rsplit(".", 1)[-1] for m, _ in _runbook_invocations()],
)
def test_runbook_commands_dry_run(module, argv, capsys, tmp_path):
    """The RUNBOOK pre-flight: every RUNBOOK command line must survive
    --dry_run END TO END (not just parse) — full flag resolution and the
    CLI's own cheap arg fixups, no checkpoints or data touched."""
    mod = importlib.import_module(module)
    argv = [a for a in argv] + ["--dry_run", "--output", str(tmp_path / "out")]
    assert mod.main(argv) is None
    assert "DRY RUN OK" in capsys.readouterr().out


@pytest.mark.parametrize("script", SCRIPTS, ids=[os.path.basename(s) for s in SCRIPTS])
def test_script_commands_dry_run(script, capsys, tmp_path):
    """Every experiment script's CLI invocation survives --dry_run end to
    end — together with the RUNBOOK commands this covers the full first-
    connected-run command surface (RUNBOOK §4 steps 1-7)."""
    with open(script) as fh:
        invocations = list(_extract_cli_invocations(fh.read()))
    assert invocations
    for module, argv in invocations:
        mod = importlib.import_module(module)
        extra = ["--dry_run"]
        if "--output" in " ".join(argv) or module.endswith(("tta_cls", "tune_cls", "tta_retrieval", "tta_caption", "train_caption")):
            extra += ["--output", str(tmp_path / "out")]
        assert mod.main(list(argv) + extra) is None
        assert "DRY RUN OK" in capsys.readouterr().out
