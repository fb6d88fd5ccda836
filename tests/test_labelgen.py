"""Label front end (features/labelgen.py) vs the reference scripts run
in-test: label-full.awk / label-mono.awk byte-equal on a synthetic
.feats table (incl. pau rows and 0-sentinels), normtext.pl byte-equal
on representative text."""
import subprocess

import numpy as np
import pytest

from hts_train_world_tpu.features import labelgen

AWK_FULL = "/root/reference/data/scripts/label-full.awk"
AWK_MONO = "/root/reference/data/scripts/label-mono.awk"
NORMTEXT = "/root/reference/data/scripts/normtext.pl"


def _feats_rows(rng, n=8):
    """Synthetic dumpfeats rows: 66 fields matching label.feats's mix of
    phone names, counts and 0-sentinels."""
    phones = ["a", "i", "u", "pau", "k", "s"]
    rows = []
    t = 0.0
    for i in range(n):
        f = []
        for j in range(1, 67):
            if j in (1, 2, 3, 63, 64):      # phone-name slots
                v = phones[int(rng.integers(0, len(phones)))]
                if j != 2 and rng.random() < 0.3:
                    v = "0"                 # missing-context sentinel
            elif j in (65, 66):             # times (seconds)
                v = f"{t:.4f}" if j == 65 else f"{t + 0.08:.4f}"
            else:
                v = str(int(rng.integers(0, 9)))
            f.append(v)
        if i == 2:
            f[1] = "pau"                    # a pau row exercises branches
        t += 0.08
        rows.append(" ".join(f))
    return "\n".join(rows) + "\n"


@pytest.mark.parametrize("seed", [0, 3])
def test_full_and_mono_labels_byte_equal_awk(tmp_path, seed):
    rng = np.random.default_rng(seed)
    feats = _feats_rows(rng)
    p = tmp_path / "x.feats"
    p.write_text(feats)
    for awk, fn in ((AWK_FULL, labelgen.full_labels),
                    (AWK_MONO, labelgen.mono_labels)):
        ref = subprocess.run(["awk", "-f", awk, str(p)],
                             capture_output=True, text=True, check=True)
        assert fn(feats) == ref.stdout


@pytest.mark.parametrize("text", [
    "Hello world.",
    "this is a test, with 3 numbers 4.5 and hy-phen",
    "Is this a question?",
    "version 2.1 release",
])
def test_normtext_byte_equal_perl(tmp_path, text):
    p = tmp_path / "t.txt"
    p.write_text(text + "\n")
    ref = subprocess.run(["perl", NORMTEXT, str(p)],
                         capture_output=True, text=True, check=True)
    assert labelgen.normalize_text(text + "\n") == ref.stdout
