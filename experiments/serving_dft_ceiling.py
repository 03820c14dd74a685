"""Device-only serving ceiling with the MXU-DFT (phasor) transform in the
per-tick program — extends SERVING_r04's device_ceiling (which used the
default jnp.fft transform) to quantify the transform's share at fleet
scale."""
import json
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer
from se_snmf_nat_tpu.runtime.profiling import measure_serving_device_ceiling

cfg = default_config()
speech, noise = load_reference_speech_noise(cfg.sep.r_d)
enh = SnmfEnhancer(cfg, speech.b_dft, noise.b_dft, speech.b_dft, noise.b_dft,
                   dtype=jnp.float32, dft_matmul=True,
                   dft_precision="high", idft_precision="default")
rep = measure_serving_device_ceiling(enh, fleet_sizes=(128, 192, 224, 256, 320))
print(json.dumps(rep))
