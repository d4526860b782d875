"""CLI argument handling — the error paths a user actually hits."""

import json
import subprocess
import sys

import pytest

from fashion_nerf.cli import _parser


def test_parser_subcommands():
    p = _parser()
    for cmd in ("train", "render", "eval", "preprocess", "bench"):
        args = p.parse_args([cmd, "--config", "tiny_lego"])
        assert args.cmd == cmd and args.config == "tiny_lego"


def test_parser_requires_subcommand():
    with pytest.raises(SystemExit):
        _parser().parse_args([])


def test_unknown_preset_clean_error():
    from fashion_nerf.cli import main
    with pytest.raises(KeyError, match="unknown preset"):
        main(["train", "--config", "definitely_not_a_preset"])


def test_bad_override_clean_error():
    from fashion_nerf.cli import main
    with pytest.raises(KeyError, match="unknown config field"):
        main(["train", "--config", "tiny_lego", "--set", "train.nope=1"])


def test_override_accumulates():
    p = _parser()
    args = p.parse_args(["train", "--set", "a=1", "--set", "b=2"])
    assert args.overrides == ["a=1", "b=2"]
