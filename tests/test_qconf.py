"""Question config / label encoding parity vs. the reference Perl scripts."""
import os
import subprocess
import tempfile

import numpy as np
import pytest

from hts_train_world_tpu.features import qconf

SCRIPTS = "/root/reference/data/scripts"
needs_ref = pytest.mark.skipif(not os.path.isdir(SCRIPTS),
                               reason="reference unavailable")

CONF = """
# test question config
C-Phone_a     {*-a+*}
C-Phone_n     {*-n+*,*-N+*}
C-NoteIdx     {*/E:%d]*} MIN=0 MAX=23
Pos_C-State_in_Phone(Fw)  MIN=2 MAX=6
Pos_C-Frame_in_State(Fw)  MIN=1 MAX=100
Pos_C-Frame_in_Phone(Bw)  MIN=1 MAX=300
"""

LABELS = """0 500000 x^x-a+n=x/E:3][2]
500000 1000000 x^x-a+n=x/E:3][3]
1000000 2000000 x^x-a+n=x/E:3][4]
2000000 2500000 x^x-a+n=x/E:3][5]
2500000 3000000 x^x-a+n=x/E:3][6]
3000000 3500000 a^a-n+x=x/E:12][2]
3500000 4000000 a^a-n+x=x/E:12][3]
4000000 4200000 a^a-n+x=x/E:12][4]
4200000 4400000 a^a-n+x=x/E:12][5]
4400000 5000000 a^a-n+x=x/E:12][6]
"""


def _run_ref(args, stdin=None):
    return subprocess.run(["perl", *args], capture_output=True, text=True,
                          check=True).stdout


@needs_ref
def test_feature_count_matches(tmp_path):
    conf = tmp_path / "q.conf"
    conf.write_text(CONF)
    ref = int(_run_ref([os.path.join(SCRIPTS, "makefeature.pl"),
                        str(conf)]).strip())
    feats = qconf.parse_config(CONF)
    assert qconf.num_features(feats) == ref == 6


@needs_ref
def test_encode_labels_matches_makefeature(tmp_path):
    conf = tmp_path / "q.conf"
    conf.write_text(CONF)
    lab = tmp_path / "in.lab"
    lab.write_text(LABELS)
    frame_shift = 50000  # 5 ms in 100 ns units
    out = _run_ref([os.path.join(SCRIPTS, "makefeature.pl"), str(conf),
                    str(frame_shift), str(lab)])
    ref = np.array([float(v) for v in out.split()]).reshape(-1, 6)
    feats = qconf.parse_config(CONF)
    labels = qconf.parse_aligned_labels(LABELS, frame_shift)
    got = qconf.encode_labels(feats, labels)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6)


@needs_ref
def test_questions_match_makequestion(tmp_path):
    conf = tmp_path / "q.conf"
    conf.write_text(CONF)
    ref = _run_ref([os.path.join(SCRIPTS, "makequestion.pl"),
                    str(conf)]).splitlines()
    got = qconf.make_questions(qconf.parse_config(CONF))
    assert got == ref
