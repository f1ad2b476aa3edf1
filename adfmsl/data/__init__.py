from adfmsl.data.audio import load_audio, read_wav, resample, write_wav
from adfmsl.data.augment import (
    add_noise_snr,
    augment_waveform,
    rir_reverb,
    synthetic_rir,
)
from adfmsl.data.preprocess import (
    create_dataset_manifest,
    explore_data_structure,
    preprocess_audio,
    trim_silence,
    validate_dataset,
)
from adfmsl.data.pack import PackedDataset, create_pack
from adfmsl.data.pad import pad, tile_pad, tile_pad_device, zero_pad, zero_pad_device
from adfmsl.data.pipeline import (
    AsvspoofDataset,
    Batch,
    DataLoader,
    FuzzyAudioResolver,
    resolve_audio_path,
)
from adfmsl.data.protocol import Protocol, ProtocolEntry, gen_spoof_list, parse_protocol
from adfmsl.data.synthetic import (SyntheticSpec, generate_fixture,
                                   generate_wild_fixture)

__all__ = [
    "load_audio", "read_wav", "resample", "write_wav",
    "pad", "tile_pad", "tile_pad_device", "zero_pad", "zero_pad_device",
    "AsvspoofDataset", "Batch", "DataLoader", "FuzzyAudioResolver", "resolve_audio_path",
    "Protocol", "ProtocolEntry", "gen_spoof_list", "parse_protocol",
    "SyntheticSpec", "generate_fixture", "generate_wild_fixture",
    "PackedDataset", "create_pack",
    "add_noise_snr", "augment_waveform", "rir_reverb", "synthetic_rir",
    "create_dataset_manifest", "explore_data_structure", "preprocess_audio", "trim_silence", "validate_dataset",
]
