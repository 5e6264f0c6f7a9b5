"""CLI tests (CPU platform; device paths covered by tools/device_fuzz)."""
import os

import numpy as np
import pytest

from pfac_tpu.tools import cli


@pytest.fixture()
def files(tmp_path, fixtures_dir):
    return (os.path.join(fixtures_dir, "pattern", "example_pattern"),
            os.path.join(fixtures_dir, "data", "example_input"))


class TestCliMatch:
    def test_match_prints_reference_output(self, files, capsys):
        pat, inp = files
        rc = cli.main(["match", "-P", pat, "-I", inp, "--platform", "cpu"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "num_matched = 5" in out
        assert "At position    0, match pattern 1" in out
        assert "At position    6, match pattern 2" in out

    def test_match_stream_equals_whole(self, files, capsys):
        pat, inp = files
        rc = cli.main(["match", "-P", pat, "-I", inp, "--platform", "cpu",
                       "--stream", "--stream-chunk", "4"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "num_matched = 5" in out

    def test_match_space_driven(self, files, capsys):
        pat, inp = files
        rc = cli.main(["match", "-P", pat, "-I", inp, "--platform", "cpu", "-S"])
        assert rc == 0
        assert "num_matched = 5" in capsys.readouterr().out
