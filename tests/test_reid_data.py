"""ReID dataset / triplet sampling / packing (reference:
mmtrack/datasets/reid_dataset.py:80-126)."""
import numpy as np

from stereotracking_tpu.data.reid import ReIDDataset, pack_reid_inputs


def _write_ann(tmp_path, n_ids=5, per_id=6):
    lines = []
    for pid in range(n_ids):
        for j in range(per_id):
            lines.append(f'imgs/{pid}_{j}.jpg {pid}')
    f = tmp_path / 'ann.txt'
    f.write_text('\n'.join(lines))
    return str(f)


def test_dataset_load_and_index(tmp_path):
    ds = ReIDDataset(_write_ann(tmp_path), data_prefix='/root')
    assert len(ds) == 30
    assert ds[0]['gt_label'] == 0
    assert ds[0]['img_path'].startswith('/root/imgs/')
    assert len(ds.pids) == 5


def test_triplet_sampling_structure(tmp_path):
    ds = ReIDDataset(_write_ann(tmp_path))
    rng = np.random.RandomState(0)
    out = ds.triplet_sampling(2, num_ids=3, ins_per_id=4, rng=rng)
    labels = out['gt_label']
    assert len(labels) == 3 * 4
    # first ins_per_id are the anchor id
    assert all(l == 2 for l in labels[:4])
    # negatives: 2 other ids, 4 each, none equal to the anchor
    assert all(l != 2 for l in labels[4:])
    assert len(set(labels[4:])) == 2


def test_pack_reid_inputs():
    imgs = [np.zeros((40, 20, 3)), np.ones((80, 30, 3)) * 255]
    batch, labels = pack_reid_inputs(imgs, [1, 2], out_hw=(64, 32))
    assert batch.shape == (2, 64, 32, 3)
    assert labels.dtype == np.int32
    assert float(batch[1].mean()) == 255.0
