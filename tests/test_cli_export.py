"""export-training CLI (python -m thecrowler_ray export-training)."""

from __future__ import annotations

import json
import os

from thecrowler_ray.__main__ import main

SF = "/root/testdata/sf0.001"


def test_export_training_cli_roundtrip(ray_session, tmp_path, capsys):
    out = str(tmp_path / "exp")
    rc = main(["export-training", "--sf-dir", SF, "--out", out,
               "--token-shards", "--window", "1024"])
    assert rc == 0
    printed = json.loads(capsys.readouterr().out)
    assert set(printed["splits"]) == {"train", "val", "test"}
    assert printed["window"] == 1024
    n_shards = printed["token_shards"]["n_shards"]
    shard_dir = printed["token_shards"]["dir"]
    assert n_shards > 0
    assert len([f for f in os.listdir(shard_dir)
                if f.endswith(".bin")]) == n_shards
    idx = json.load(open(os.path.join(shard_dir, "index.json")))
    assert idx["window"] == 1024 and len(idx["shards"]) == n_shards
    # manifest on disk matches what the CLI printed
    mani = json.load(open(os.path.join(out, "manifest.json")))
    assert mani["splits"] == printed["splits"]
