"""Streaming synthesizer: chunked output must equal offline batch
synthesis (same noise stream) on the overlapping region."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops import rand, synthesis as syn
from hts_train_world_tpu.ops.synthesis_rt import StreamingSynthesizer


def test_streaming_equals_batch(golden16):
    fs, N, T = golden16.fs, golden16.fft_size, golden16.f0_length
    f0 = golden16.f64("sm_f0")
    sp, ap = golden16.sp, golden16.ap
    yl = golden16.y_length
    stream = rand.randn_stream(syn.synthesis_stream_len(yl))
    ref = np.asarray(syn.synthesis(
        jnp.asarray(f0), jnp.asarray(sp), jnp.asarray(ap), N, 5.0, fs, yl,
        jnp.asarray(stream)))

    s = StreamingSynthesizer(fs, 5.0, N, buffer_size=2000,
                             noise_stream=stream)
    out = []
    # feed frames incrementally, a few at a time, reading when possible
    fed = 0
    while fed < T or not s.starved:
        if s.starved and fed < T:
            n = min(16, T - fed)
            s.add_parameters(f0[fed:fed + n], sp[fed:fed + n],
                             ap[fed:fed + n])
            fed += n
            continue
        chunk = s.read()
        if chunk is None:
            break
        out.append(chunk)
    y = np.concatenate(out) if out else np.zeros(0)
    n = min(len(y), yl)
    assert n > yl // 2, f"stream produced only {n} of {yl} samples"
    np.testing.assert_allclose(y[:n], ref[:n], atol=1e-10)
