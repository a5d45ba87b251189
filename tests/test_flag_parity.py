"""CLI flag-surface parity with the reference.

The flag surface IS the compatibility contract: a user must be able to
take a reference command line (README.md:59-82 and eval commands) and run
it here. This pins that every flag the reference defines
(switch_nerf/opts.py + opts_nerf.py) exists in our parsers, minus an
explicit, justified allowlist.
"""
import re
from pathlib import Path

import pytest

from switch_nerf_tpu.config import get_opts, get_opts_nerf

REFERENCE = Path("/root/reference/switch_nerf")

# torch-runtime knobs with no JAX meaning, each with the reason:
ALLOWED_ABSENT = {
    # DDP find_unused_parameters toggle (reference runner.py DDP wrap);
    # SPMD jit has no unused-parameter bookkeeping to disable
    "no_find_unused_parameters",
}


def _reference_flags() -> set:
    flags = set()
    for name in ("opts.py", "opts_nerf.py"):
        src = (REFERENCE / name).read_text()
        flags |= set(re.findall(r"add_argument\(\s*'--([A-Za-z0-9_]+)'",
                                src))
    return flags


def _our_flags() -> set:
    ours = set()
    for parser in (get_opts(), get_opts_nerf()):
        for action in parser._actions:
            for s in action.option_strings:
                if s.startswith("--"):
                    ours.add(s[2:])
    return ours


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_every_reference_flag_exists_here():
    ref = _reference_flags()
    assert len(ref) > 60, "reference flag extraction regressed"
    missing = ref - _our_flags() - ALLOWED_ABSENT
    assert not missing, (
        f"reference flags absent from our parsers: {sorted(missing)}")


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_allowlist_is_not_stale():
    # every allowlisted flag must still exist in the reference — otherwise
    # the entry is dead and should be removed
    ref = _reference_flags()
    stale = ALLOWED_ABSENT - ref
    assert not stale, f"stale allowlist entries: {sorted(stale)}"
