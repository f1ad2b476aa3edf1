"""adfmsl — TPU-native audio deepfake detection with FMSL.

A from-scratch JAX/Flax/Pallas rebuild of the capability set of the
``Ansh4121/audio-deepfake-detection-fmsl`` thesis codebase (reference mounted at
``/root/reference``): ASVspoof-2019-LA bonafide/spoof detection with a registry of
RawNet/SincConv and Wav2Vec2-feature classifiers (the eight "maze" models), the FMSL
geometric head (hypersphere L2-normalisation + AM-Softmax angular margin + learnable
spoof prototypes) in its three integration modes, standardized-config training, and the
score-file -> EER/min-DCF evaluation/analysis pipeline.

Package map (mirrors SURVEY.md section 7):
  config/      standardized hyperparameter contract + YAML + consistency verifier
  data/        protocol parsing, audio decode, fixed-shape batching, synthetic fixture
  ops/         on-device DSP front-ends (STFT/mel/LFCC/CMVN/sinc/SpecAugment) + Pallas
  models/      Flax blocks and the maze model registry (+ LCNN, ResNet, Wav2Vec2)
  heads/       FMSL head, losses, episodic few-shot utilities
  train/       jitted train/eval steps, optax factories, epoch driver, Orbax ckpts
  parallel/    device mesh, shardings, collectives (data-parallel default)
  evaluation/  score files, EER / min-DCF / min t-DCF, bootstrap significance
  analysis/    score aggregation, tables, reports
  cli/         adfmsl-train / adfmsl-eval / adfmsl-analyze entry points
  io_native/   C++ audio decoder + threaded prefetch loader (ctypes bindings)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the big maze programs take minutes to compile on
# TPU (sinc conv over 64,600 samples); caching makes every run after the first start
# instantly. Opt out with ADFMSL_NO_COMPILE_CACHE=1.
if not _os.environ.get("ADFMSL_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "ADFMSL_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "adfmsl_xla"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options
        pass
