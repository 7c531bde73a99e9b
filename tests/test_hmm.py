import numpy as np

from ngsepcore_tpu.kernels.hmm import (
    backward_log,
    baum_welch_expected_counts,
    forward_log,
    posterior_log,
    viterbi_log,
)


def _toy_hmm():
    # 2-state weather-style HMM in log10
    start = np.log10(np.array([0.6, 0.4]))
    trans = np.log10(np.array([[[0.7, 0.3], [0.4, 0.6]]]))
    # emissions for an observation sequence under B matrix
    B = np.array([[0.9, 0.1], [0.2, 0.8]])
    obs = [0, 0, 1, 0, 1, 1]
    emit = np.log10(np.stack([B[:, o] for o in obs]))
    return start, trans, emit, B, obs


def _brute_force_likelihood(start, trans, emit):
    S = len(start)
    T = emit.shape[0]
    start_l = 10.0 ** start
    trans_l = 10.0 ** trans[0]
    emit_l = 10.0 ** emit
    total = 0.0
    best_p, best_path = -1, None
    import itertools

    for path in itertools.product(range(S), repeat=T):
        p = start_l[path[0]] * emit_l[0, path[0]]
        for t in range(1, T):
            p *= trans_l[path[t - 1], path[t]] * emit_l[t, path[t]]
        total += p
        if p > best_p:
            best_p, best_path = p, path
    return total, best_p, best_path


def test_forward_likelihood_matches_bruteforce():
    start, trans, emit, _, _ = _toy_hmm()
    _, ll = forward_log(start, trans, emit)
    total, _, _ = _brute_force_likelihood(start, trans, emit)
    assert abs(10.0 ** float(ll) - total) < 1e-12


def test_viterbi_matches_bruteforce():
    start, trans, emit, _, _ = _toy_hmm()
    path, best = viterbi_log(start, trans, emit)
    _, best_p, best_path = _brute_force_likelihood(start, trans, emit)
    assert list(np.asarray(path)) == list(best_path)
    assert abs(10.0 ** float(best) - best_p) < 1e-12


def test_posteriors_normalize_and_match_bruteforce():
    start, trans, emit, _, _ = _toy_hmm()
    post, ll = posterior_log(start, trans, emit)
    post = 10.0 ** np.asarray(post)
    assert np.allclose(post.sum(axis=1), 1.0, atol=1e-10)
    # brute force posterior of state 0 at t=2
    import itertools

    S, T = 2, emit.shape[0]
    start_l, trans_l, emit_l = 10.0 ** start, 10.0 ** trans[0], 10.0 ** emit
    num = 0.0
    den = 0.0
    for path in itertools.product(range(S), repeat=T):
        p = start_l[path[0]] * emit_l[0, path[0]]
        for t in range(1, T):
            p *= trans_l[path[t - 1], path[t]] * emit_l[t, path[t]]
        den += p
        if path[2] == 0:
            num += p
    assert abs(post[2, 0] - num / den) < 1e-10


def test_baum_welch_counts_sane():
    start, trans, emit, _, _ = _toy_hmm()
    exp_trans, gamma, ll = baum_welch_expected_counts(start, trans, emit)
    exp_trans = np.asarray(exp_trans)
    gamma = np.asarray(gamma)
    T = emit.shape[0]
    assert abs(exp_trans.sum() - (T - 1)) < 1e-8
    assert np.allclose(gamma.sum(axis=1), 1.0, atol=1e-8)
