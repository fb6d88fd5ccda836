"""MDL tree clustering: recovers the generative partition, MDL stops
over-splitting, pattern routing works."""
import numpy as np

from hts_train_world_tpu.models import clustering


def _q(name, patts):
    return clustering.Question(name, patts)


def test_cluster_recovers_partition():
    rng = np.random.default_rng(0)
    # contexts: vowel models centered at +2, consonants at -2
    contexts = [f"x^x-{p}+x=x" for p in
                ("a", "i", "u", "e", "o", "k", "s", "t", "n", "m")]
    vowels = {"a", "i", "u", "e", "o"}
    stats = {}
    for c in contexts:
        ph = c.split("-")[1].split("+")[0]
        mu = 2.0 if ph in vowels else -2.0
        x = mu + 0.3 * rng.standard_normal((200, 3))
        stats[c] = clustering.SuffStats.from_frames(x)
    questions = [
        _q("C-Vowel", [f"*-{v}+*" for v in vowels]),
        _q("C-Phone_a", ["*-a+*"]),
        _q("C-Phone_k", ["*-k+*"]),
    ]
    tree = clustering.cluster_states(stats, questions, mdl_factor=1.0)
    assert tree.n_leaves == 2
    leaves = {c: tree.leaf_of(c) for c in contexts}
    vowel_leaves = {leaves[c] for c in contexts
                    if c.split("-")[1].split("+")[0] in vowels}
    cons_leaves = {leaves[c] for c in contexts
                   if c.split("-")[1].split("+")[0] not in vowels}
    assert len(vowel_leaves) == 1 and len(cons_leaves) == 1
    assert vowel_leaves != cons_leaves
    # leaf means near the generative centers
    means = sorted(float(m.mean()) for m, v in tree.leaf_params)
    assert abs(means[0] + 2.0) < 0.1 and abs(means[1] - 2.0) < 0.1


def test_mdl_stops_on_noise():
    rng = np.random.default_rng(1)
    contexts = [f"x^x-p{i}+x=x" for i in range(12)]
    stats = {c: clustering.SuffStats.from_frames(
        0.5 * rng.standard_normal((50, 4))) for c in contexts}
    questions = [_q(f"Q{i}", [f"*-p{i}+*"]) for i in range(12)]
    tree = clustering.cluster_states(stats, questions, mdl_factor=1.0)
    assert tree.n_leaves <= 2  # homogeneous data -> no (real) splits


def test_tree_serialization():
    rng = np.random.default_rng(2)
    stats = {
        "x^x-a+x=x": clustering.SuffStats.from_frames(
            2.0 + 0.1 * rng.standard_normal((100, 2))),
        "x^x-k+x=x": clustering.SuffStats.from_frames(
            -2.0 + 0.1 * rng.standard_normal((100, 2))),
    }
    tree = clustering.cluster_states(stats, [_q("C-a", ["*-a+*"])],
                                     mdl_factor=0.2, min_occupancy=0.5)
    text = clustering.tree_to_hts_text(tree, "mgc", 0)
    assert "C-a" in text and "{*}[2]" in text
