"""FewshotTrainer end-to-end on the synthetic fixture (BASELINE configs #3/#5)."""
import numpy as np
import pytest

from adfmsl.config import make_experiment
from adfmsl.data import AsvspoofDataset, parse_protocol
from adfmsl.evaluation import compute_eer
from adfmsl.train import FewshotConfig, FewshotTrainer


def test_fewshot_meta_train_adapt_score(fixture_dir):
    exp = make_experiment("maze5")
    exp.data.cut = 8000
    fcfg = FewshotConfig(n_way=2, k_shot=1, q_queries=1, episodes_per_batch=2,
                         n_steps=6, lr=1e-3)
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    ds = AsvspoofDataset(proto, fixture_dir["train"]["audio_dir"], cut=exp.data.cut)
    trainer = FewshotTrainer(exp, fcfg, proto, ds)
    hist = trainer.fit()
    assert len(hist) == 6
    assert all(np.isfinite(h["loss"]) for h in hist)

    # K-shot adapt on the eval split, score the rest
    eval_proto = parse_protocol(fixture_dir["eval"]["protocol"])
    eval_ds = AsvspoofDataset(eval_proto, fixture_dir["eval"]["audio_dir"],
                              cut=exp.data.cut)
    labels = eval_proto.labels
    support, sup_y = [], []
    for cls in (0, 1):
        for u in [u for u in eval_proto.utt_ids if labels[u] == cls][:2]:
            support.append(eval_ds.load(u)[0])
            sup_y.append(cls)
    protos = trainer.adapt(np.stack(support), np.asarray(sup_y))
    assert protos.shape[0] == 2
    scores = trainer.score_protocol(eval_ds, protos, batch_size=8)
    assert set(scores) == set(eval_proto.utt_ids)
    y = np.asarray([labels[u] for u in scores])
    eer, _ = compute_eer(np.asarray(list(scores.values())), y)
    assert 0.0 <= eer <= 1.0  # numeric sanity; quality asserted in the CLI drive
