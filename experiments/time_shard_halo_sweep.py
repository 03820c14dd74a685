"""r5: halo sweep for the time-sharded plan (VERDICT r4 #5) — find the
halo depth at which the 8-way time-sharded f32 plan clears the 0.993
golden-corr gate on BOTH fixtures.  CPU 8-device mesh (the recorded
quality recipe).  Writes experiments/time_shard_halo_sweep_out.json."""
import json
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
from se_snmf_nat_tpu.io.wavio import read_wav_int16
from se_snmf_nat_tpu.parallel.time_shard import enhance_time_sharded
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

cfg = default_config()
speech, noise = load_reference_speech_noise(cfg.sep.r_d)
enh = SnmfEnhancer(cfg, speech.b_dft, noise.b_dft, speech.b_dft,
                   noise.b_dft, dtype=jnp.float32)
mesh = Mesh(np.asarray(jax.devices()), ("data",))

out = {}
for name in ("M03_423C0213_STR.CH6", "LM_in"):
    x, fs = read_wav_int16(f"/root/reference/wav/{name}.wav")
    gold, _ = read_wav_int16(f"/root/reference/wav/{name}_out_v3.9_18.wav")
    g = gold.astype(np.float64)
    y_seq = enh.enhance(x).astype(np.float64)
    n0 = min(len(y_seq), len(g))
    rows = {"sequential_corr_vs_golden": round(
        float(np.corrcoef(y_seq[:n0], g[:n0])[0, 1]), 5)}
    for halo in (64, 128, 192, 256, 384):
        y = enhance_time_sharded(enh, x, mesh, halo=halo).astype(np.float64)
        n = min(len(y), len(g), len(y_seq))
        rows[f"halo{halo}"] = {
            "corr_vs_golden": round(
                float(np.corrcoef(y[:n], g[:n])[0, 1]), 5),
            "corr_vs_sequential": round(
                float(np.corrcoef(y[:n], y_seq[:n])[0, 1]), 6),
            "mean_abs_lsb_vs_seq": round(
                float(np.abs(y[:n] - y_seq[:n]).mean()), 2)}
        print(name, halo, rows[f"halo{halo}"], flush=True)
    out[name] = rows

print(json.dumps(out, indent=1))
with open("experiments/time_shard_halo_sweep_out.json", "w") as f:
    json.dump(out, f, indent=1)
