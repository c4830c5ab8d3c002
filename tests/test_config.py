"""Config system: YAML hook includes, auto-CLI typing, full knob exposure."""

import os

import pytest

from sml_tpu.config import (Config, build_parser, config_defaults, full_cli_config,
                            yaml_config_hook)


def test_yaml_hook_defaults_includes(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "extra.yaml").write_text("foo: 7\nbar: 'x'\n")
    main = tmp_path / "main.yaml"
    main.write_text("defaults:\n  - sub: extra\nbase: 1\n")
    cfg = yaml_config_hook(str(main))
    assert cfg == {"base": 1, "foo": 7, "bar": "x"}


def test_build_parser_type_inference():
    parser = build_parser({"a": 1, "b": 0.5, "c": "s", "d": True})
    args = parser.parse_args(["--a", "3", "--b", "0.25", "--d", "false"])
    assert args.a == 3 and args.b == 0.25 and args.c == "s" and args.d is False
    args2 = parser.parse_args(["--d", "true"])
    assert args2.d is True


def test_full_cli_config_exposes_all_knobs():
    merged = full_cli_config({"mode": "omic"})
    # every Config annotation must be a flag (regression for the verify finding:
    # packed_dir/device_loop/path_arch were CLI-invisible)
    for knob in ("packed_dir", "device_loop", "path_arch", "modulation_style",
                 "use_pallas", "batchloss_grad_scale"):
        assert knob in merged
    assert merged["mode"] == "omic"  # YAML wins


def test_repo_yaml_parses_to_valid_config():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = full_cli_config(yaml_config_hook(
        os.path.join(repo, "config", "config_mine.yaml")))
    parser = build_parser(cfg)
    config = Config(**vars(parser.parse_args([])))
    assert config.fixdim == 2500
    assert config.mode == "deformpathomic"


def test_config_validation_errors():
    with pytest.raises(ValueError):
        Config(mode="bogus")
    with pytest.raises(ValueError):
        Config(attn_dim=3)
    with pytest.raises(ValueError, match="return_vgrid"):
        Config(attn_dim=1)          # 1-D has no vgrid (reference crashes too)
    assert Config(attn_dim=1, return_vgrid=False).attn_dim == 1
    assert Config(fixdim=4096).grid_size == 64
