"""CLI flag parsing (cli/main.py): config-field flags, bool safety."""

import argparse

import pytest

from telomeri_tpu.cli.main import _config_from_args, _parse_bool, build_parser
from telomeri_tpu.config import ScaffoldConfig


def test_config_flag_overrides():
    ap = build_parser()
    args = ap.parse_args([
        "scaffold", "--contigs", "c.fa", "--reads", "r.fa",
        "--paf-read-contig", "rc.paf", "--paf-read-read", "rr.paf",
        "--out", "o.fa", "--max-steps", "16", "--min-identity", "0.9"])
    cfg = _config_from_args(args)
    assert cfg.max_steps == 16
    assert cfg.min_identity == pytest.approx(0.9)
    # untouched fields keep defaults
    assert cfg.mc_walks_per_end == ScaffoldConfig().mc_walks_per_end


def test_parse_bool_rejects_garbage_and_parses_false():
    # argparse's type=bool footgun: bool("False") is True. Our parser is explicit.
    assert _parse_bool("false") is False
    assert _parse_bool("False") is False
    assert _parse_bool("0") is False
    assert _parse_bool("true") is True
    assert _parse_bool("YES") is True
    with pytest.raises(argparse.ArgumentTypeError):
        _parse_bool("maybe")


def test_bool_config_field_would_get_safe_parser():
    """A future bool field must route through _parse_bool, not type=bool."""
    import dataclasses

    from telomeri_tpu.cli import main as cli_main

    @dataclasses.dataclass(frozen=True)
    class FakeCfg:
        fancy: bool = False

    real = dataclasses.fields(ScaffoldConfig)
    fake = dataclasses.fields(FakeCfg)
    orig = cli_main.dataclasses.fields
    cli_main.dataclasses.fields = lambda c: fake if c is ScaffoldConfig else orig(c)
    try:
        ap = argparse.ArgumentParser()
        cli_main._add_config_flags(ap)
        ns = ap.parse_args(["--fancy", "False"])
        assert ns.fancy is False
        ns = ap.parse_args(["--fancy", "true"])
        assert ns.fancy is True
    finally:
        cli_main.dataclasses.fields = orig
    assert dataclasses.fields(ScaffoldConfig) == real
