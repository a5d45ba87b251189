"""Config-system semantics: YAML folding must behave like the reference's
configargparse (opts.py uses YAMLConfigFileParser).

Covers the round-2 review findings: scalar YAML values for nargs='+'
options, YAML satisfying `required` options, and choices validation for
YAML-supplied values.
"""
import pytest

from switch_nerf_tpu.config import get_opts, parse_args


def _cfg(tmp_path, text):
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return str(p)


BASE = ["--exp_name", "/tmp/e", "--dataset_path", "/tmp/d"]


def test_yaml_scalar_listified_for_nargs(tmp_path):
    cfg = _cfg(tmp_path, "chunk_paths: /data/chunks\nskip_layers: 4\n")
    h = parse_args(get_opts(), BASE + ["--config_file", cfg])
    assert h.chunk_paths == ["/data/chunks"]      # NOT a bare string
    assert h.skip_layers == [4]


def test_yaml_satisfies_required_options(tmp_path):
    cfg = _cfg(tmp_path, "exp_name: /tmp/e\ndataset_path: /tmp/d\n")
    h = parse_args(get_opts(), ["--config_file", cfg])
    assert h.exp_name == "/tmp/e" and h.dataset_path == "/tmp/d"


def test_yaml_value_validated_against_choices(tmp_path):
    cfg = _cfg(tmp_path, "dataset_type: tfrecord\n")   # typo'd choice
    with pytest.raises(ValueError, match="dataset_type"):
        parse_args(get_opts(), BASE + ["--config_file", cfg])


def test_unknown_yaml_key_still_raises(tmp_path):
    cfg = _cfg(tmp_path, "not_a_flag: 1\n")
    with pytest.raises(ValueError, match="not_a_flag"):
        parse_args(get_opts(), BASE + ["--config_file", cfg])


def test_cli_still_overrides_yaml(tmp_path):
    cfg = _cfg(tmp_path, "batch_size: 123\n")
    h = parse_args(get_opts(),
                   BASE + ["--config_file", cfg, "--batch_size", "55"])
    assert h.batch_size == 55
    h2 = parse_args(get_opts(), BASE + ["--config_file", cfg])
    assert h2.batch_size == 123


def test_parser_reuse_not_contaminated(tmp_path):
    """parse_args restores BOTH parser mutations from YAML folding —
    `required` flags AND set_defaults values — so a reused parser
    instance neither loses required-enforcement nor leaks the previous
    parse's config values into a config-less parse."""
    cfg = _cfg(tmp_path, "batch_size: 123\n")
    parser = get_opts()
    h1 = parse_args(parser, BASE + ["--config_file", cfg])
    assert h1.batch_size == 123
    # second parse on the SAME parser, no config file: code default back
    h2 = parse_args(parser, BASE)
    assert h2.batch_size != 123
    # and required options are still enforced
    with pytest.raises(SystemExit):
        parse_args(parser, [])


def test_cli_crash_record(tmp_path):
    """@record analog (reference train.py:18): a raising Runner exits
    nonzero AND leaves a structured crash report with the traceback."""
    import json
    import os
    import subprocess
    import sys

    err_file = tmp_path / "crash.json"
    env = dict(os.environ)
    env["SWITCH_NERF_ERROR_FILE"] = str(err_file)
    env.pop("JAX_PLATFORMS", None)
    # CPU-only child: skip the axon tunnel dial (hangs during outages).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','')"
        " + ' --xla_force_host_platform_device_count=2'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from switch_nerf_tpu.train import main\n"
        "main()\n")
    proc = subprocess.run(
        [sys.executable, "-c", code, "--exp_name", str(tmp_path / "exp"),
         "--dataset_path", str(tmp_path / "missing_scene")],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=300)
    assert proc.returncode != 0
    assert err_file.exists(), proc.stdout[-2000:]
    report = json.loads(err_file.read_text())
    assert report["exc_type"] and report["traceback"]
    assert "Traceback" in report["traceback"]
    assert report["argv"] and report["pid"] > 0
    assert "crash report written" in proc.stdout


import pathlib as _pathlib

import pytest as _pytest

_CFG_DIR = (_pathlib.Path(__file__).resolve().parent.parent
            / "configs" / "switch_nerf")


@_pytest.mark.parametrize(
    "cfg", sorted(_CFG_DIR.glob("*.yaml")), ids=lambda p: p.stem)
def test_shipped_configs_parse_and_build(cfg):
    """Every shipped scene YAML parses through its production parser and
    its model graph actually initializes (catches config typos in the
    scenes no other test loads — rubble/residence/sci-art/campus)."""
    import jax
    from switch_nerf_tpu.config import get_opts, get_opts_nerf, parse_args
    from switch_nerf_tpu.models.model_utils import get_bg_nerf, get_nerf
    from switch_nerf_tpu.trainer import create_train_state

    import yaml
    # dispatch on the config's own data_type (the field the CLIs key on),
    # not on the filename, so new/renamed scene YAMLs route correctly
    is_nerf = yaml.safe_load(cfg.read_text()).get("data_type") == "nerf"
    parser = get_opts_nerf() if is_nerf else get_opts()
    argv = ["--config_file", str(cfg), "--exp_name", "unused",
            "--dataset_path", "unused"]
    if not is_nerf:
        # the published commands pass the MoE switches on the CLI
        # (reference README.md:59-82), not in the YAML
        argv += ["--use_moe", "--use_moe_external_gate",
                 "--use_gate_input_norm", "--batch_prioritized_routing"]
    h = parse_args(parser, argv)
    assert h.model is not None and "layers" in h.model

    model = get_nerf(h, appearance_count=2)
    bg = get_bg_nerf(h, 2) if h.bg_nerf else None
    state = create_train_state(jax.random.PRNGKey(0), h, model, bg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    assert n_params > 1000


def test_flag_semantics_audit():
    """No reference flag silently changes nothing (round-3 verdict weak
    item 2): name-string behavior selectors must agree with the
    structural selection or error; N/A-by-design flags warn; and
    --apply_on_expert_fn_name overrides the dispatch-mode choice."""
    from switch_nerf_tpu.models.model_utils import _dispatch_mode
    from switch_nerf_tpu.runner import Runner

    def audit(data_type="mega_nerf", **over):
        h = parse_args(get_opts(), ["--exp_name", "x",
                                    "--dataset_path", "y"])
        for k, v in over.items():
            setattr(h, k, v)
        r = Runner.__new__(Runner)
        r.hparams = h
        r.data_type = data_type
        r._audit_flag_semantics()
        return h

    # agreeing names pass; disagreeing names are configuration errors
    audit(training_step_fn="_training_step")
    audit(training_step_fn="_training_step_mip", use_mip=True)
    audit("nerf", training_step_fn="_training_step_nerf_mip", use_mip=True)
    with pytest.raises(ValueError, match="training_step_fn"):
        audit(training_step_fn="_training_step_mip")
    with pytest.raises(ValueError, match="training_step_fn"):
        audit("nerf", training_step_fn="_training_step")

    audit(render_image_fn_name="render_image")
    audit("block_nerf", render_image_fn_name="render_image_blocknerf")
    with pytest.raises(ValueError, match="render_image_fn_name"):
        audit(render_image_fn_name="render_image_blocknerf")

    # N/A-by-design flags run (warn) rather than raise
    audit(moe_layer_num=3)
    audit(moe_layer_ids=["0", "2"])
    audit(expertmlp2seqexperts=True)
    audit(use_moe=True)                      # nodrop eval-default note
    audit(find_unused_parameters=True)       # torch-DDP plumbing note
    audit(data_loader_num_workers=4)         # DataLoader plumbing note
    audit(set_timeout=True)                  # NCCL-timeout plumbing note

    # --apply_on_expert_fn_name -> dispatch-mode override (reference
    # opts.py:258-259 / tutel_moe_layer_nobatch.py:768-770)
    h = audit()
    assert _dispatch_mode(h, True) == "padded"
    assert _dispatch_mode(h, False) == "nodrop"
    h.apply_on_expert_fn_name = "apply_on_expert_fn"
    assert _dispatch_mode(h, False) == "padded"       # overrides the flag
    h.apply_on_expert_fn_name = "apply_on_expert_fn_nobatch"
    assert _dispatch_mode(h, True) == "nodrop"
    h.apply_on_expert_fn_name = "apply_on_expert_fn_nobatch_torch"
    assert _dispatch_mode(h, True) == "nodrop"
    h.apply_on_expert_fn_name = "bogus"
    with pytest.raises(ValueError, match="apply_on_expert_fn_name"):
        _dispatch_mode(h, True)
