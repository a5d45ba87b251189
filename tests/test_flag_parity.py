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


def _stub_configargparse():
    """The image has no configargparse; stub it with plain argparse so the
    reference's opts modules execute (no config file is passed, so the
    YAML machinery is never exercised)."""
    import argparse
    import sys
    import types

    if "configargparse" in sys.modules:
        return
    mod = types.ModuleType("configargparse")

    class ArgParser(argparse.ArgumentParser):
        def __init__(self, *a, **kw):
            kw.pop("config_file_parser_class", None)
            super().__init__(*a, **kw)

        def add_argument(self, *a, **kw):
            kw.pop("is_config_file", None)
            return super().add_argument(*a, **kw)

    mod.ArgParser = ArgParser
    mod.YAMLConfigFileParser = object
    sys.modules["configargparse"] = mod


# Defaults that deliberately differ, each with the reason:
ALLOWED_DEFAULT_DIFF = {
    # repo-layout-relative default paths (the reference points into its
    # own package tree, 'mega_nerf/datasets/lists/...'; ours into
    # 'switch_nerf_tpu/datasets/lists/...') — same files, same format
    "block_train_list_path",
    "block_val_list_path",
    "block_image_hash_id_map_path",
}


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_shared_flag_defaults_match():
    """A reference user omitting a flag must get the reference's default.
    Parses BOTH frameworks' parsers with only the required args and
    compares every shared flag's default value."""
    import importlib.util
    import sys

    _stub_configargparse()
    for get, name in ((get_opts, "opts"), (get_opts_nerf, "opts_nerf")):
        spec = importlib.util.spec_from_file_location(
            f"ref_{name}", REFERENCE / f"{name}.py")
        ref_mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_{name}"] = ref_mod
        spec.loader.exec_module(ref_mod)
        ref_parser = ref_mod.get_opts_base()
        ref_defaults = {a.dest: a.default for a in ref_parser._actions
                        if a.option_strings}
        our_defaults = {a.dest: a.default for a in get()._actions
                        if a.option_strings}
        diffs = []
        for dest in sorted(set(ref_defaults) & set(our_defaults)
                           - ALLOWED_DEFAULT_DIFF):
            r, o = ref_defaults[dest], our_defaults[dest]
            if r != o and not (r is None and o is None):
                diffs.append(f"{name}:{dest}: reference={r!r} ours={o!r}")
        assert not diffs, "default mismatches:\n" + "\n".join(diffs)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_default_diff_allowlist_is_not_stale():
    """Every ALLOWED_DEFAULT_DIFF entry must actually differ in at least
    one parser pair — entries whose defaults match are dead weight."""
    import importlib.util
    import sys

    _stub_configargparse()
    still_differ = set()
    for get, name in ((get_opts, "opts"), (get_opts_nerf, "opts_nerf")):
        spec = importlib.util.spec_from_file_location(
            f"ref2_{name}", REFERENCE / f"{name}.py")
        ref_mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref2_{name}"] = ref_mod
        spec.loader.exec_module(ref_mod)
        rd = {a.dest: a.default for a in ref_mod.get_opts_base()._actions
              if a.option_strings}
        od = {a.dest: a.default for a in get()._actions if a.option_strings}
        for dest in ALLOWED_DEFAULT_DIFF:
            if dest in rd and dest in od and rd[dest] != od[dest]:
                still_differ.add(dest)
    stale = ALLOWED_DEFAULT_DIFF - still_differ
    assert not stale, f"stale default-diff allowlist entries: {sorted(stale)}"


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_shared_flag_choices_are_superset():
    """A choice value the reference accepts must be accepted here too
    (ours may add extras, e.g. extension dispatch modes)."""
    import importlib.util
    import sys

    _stub_configargparse()
    bad = []
    for get, name in ((get_opts, "opts"), (get_opts_nerf, "opts_nerf")):
        spec = importlib.util.spec_from_file_location(
            f"ref3_{name}", REFERENCE / f"{name}.py")
        ref_mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref3_{name}"] = ref_mod
        spec.loader.exec_module(ref_mod)
        rc = {a.dest: a.choices for a in ref_mod.get_opts_base()._actions
              if a.option_strings and a.choices}
        oc = {a.dest: a.choices for a in get()._actions if a.option_strings}
        for dest, choices in rc.items():
            if dest not in oc:
                continue
            ours = oc[dest]
            if ours is not None and not set(choices) <= set(ours):
                bad.append(f"{name}:{dest}: reference {sorted(choices)} "
                           f"vs ours {sorted(ours)}")
    assert not bad, "choice regressions:\n" + "\n".join(bad)
