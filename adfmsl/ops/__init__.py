from adfmsl.ops.bn_act import BNAct, norm_act
from adfmsl.ops.cmvn import cmvn
from adfmsl.ops.dropout import RDropout, recompute_dropout
from adfmsl.ops.lfcc import dct_matrix, lfcc, logmel
from adfmsl.ops.mel import (
    apply_filterbank,
    hz_to_mel,
    linear_filterbank,
    log_compress,
    mel_filterbank,
    mel_to_hz,
)
from adfmsl.ops.sinc import sinc_conv, sinc_filters, sinc_init
from adfmsl.ops.pallas.lfcc_fused import lfcc_fused
from adfmsl.ops.pallas.sinc_fused import sinc_abs_pool_fused
from adfmsl.ops.specaugment import spec_augment
from adfmsl.ops.stft import power_spectrogram, stft_conv, stft_fft, stft_matmul
from adfmsl.ops.window import frame, hann, num_frames

__all__ = [
    "BNAct", "norm_act", "RDropout", "recompute_dropout",
    "cmvn", "dct_matrix", "lfcc", "logmel",
    "apply_filterbank", "hz_to_mel", "linear_filterbank", "log_compress",
    "mel_filterbank", "mel_to_hz",
    "sinc_conv", "sinc_filters", "sinc_init", "spec_augment",
    "lfcc_fused", "sinc_abs_pool_fused",
    "power_spectrogram", "stft_conv", "stft_fft", "stft_matmul",
    "frame", "hann", "num_frames",
]
