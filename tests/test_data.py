"""Tests for datasets and loaders."""
import os
import tempfile

import numpy as np
import pytest

from deepchem_tpu.data import (NumpyDataset, DiskDataset, CSVLoader,
                               UserCSVLoader, InMemoryLoader, SDFLoader,
                               FASTALoader, Databag)
from deepchem_tpu.feat import (CircularFingerprint, ConvMolFeaturizer,
                               UserDefinedFeaturizer)


def test_numpy_dataset_basics():
    X = np.random.rand(10, 5)
    y = np.random.rand(10, 3)
    ds = NumpyDataset(X, y)
    assert len(ds) == 10
    assert ds.get_shape() == ((10, 5), (10, 3), (10, 3), (10,))
    assert list(ds.get_task_names()) == [0, 1, 2]
    assert np.allclose(ds.w, 1.0)


def test_numpy_dataset_1d_y_promoted():
    ds = NumpyDataset(np.random.rand(5, 3), np.arange(5))
    assert ds.y.shape == (5, 1)
    assert ds.w.shape == (5, 1)


def test_iterbatches_pad_and_count():
    ds = NumpyDataset(np.random.rand(10, 4), np.random.rand(10, 2))
    batches = list(ds.iterbatches(4, pad_batches=True, deterministic=True))
    assert len(batches) == 3                     # ceil(10/4)
    assert all(b[0].shape == (4, 4) for b in batches)
    # padded tail has zero weights
    assert np.all(batches[-1][2][2:] == 0)


def test_itersamples():
    ds = NumpyDataset(np.arange(12).reshape(6, 2), np.arange(6))
    samples = list(ds.itersamples())
    assert len(samples) == 6
    assert np.allclose(samples[3][0], [6, 7])


def test_statistics():
    X = np.random.rand(50, 3)
    y = np.random.rand(50, 2)
    ds = NumpyDataset(X, y)
    xm, xs, ym, ys = ds.get_statistics()
    assert np.allclose(xm, X.mean(0), atol=1e-6)
    assert np.allclose(ys, y.std(0), atol=1e-6)


def test_to_from_dataframe():
    ds = NumpyDataset(np.random.rand(8, 3), np.random.rand(8, 2))
    df = ds.to_dataframe()
    ds2 = NumpyDataset.from_dataframe(df)
    assert np.allclose(ds.X, ds2.X)
    assert np.allclose(ds.y, ds2.y)


def test_disk_dataset_roundtrip(tmp_path):
    X = np.random.rand(25, 6)
    y = np.random.rand(25, 2)
    ds = DiskDataset.from_numpy(X, y, tasks=['t0', 't1'],
                                data_dir=str(tmp_path / 'd1'))
    assert len(ds) == 25
    assert list(ds.tasks) == ['t0', 't1']
    ds2 = DiskDataset(str(tmp_path / 'd1'))
    assert np.allclose(ds2.X, X)
    assert np.allclose(ds2.y, y)


def test_disk_dataset_select_order():
    X = np.arange(40).reshape(20, 2)
    ds = DiskDataset.from_numpy(X, np.arange(20))
    sel = ds.select([7, 3, 15, 0])
    assert np.allclose(sel.X, X[[7, 3, 15, 0]])


def test_disk_dataset_reshard(tmp_path):
    X = np.random.rand(30, 4)
    ds = DiskDataset.from_numpy(X, np.arange(30),
                                data_dir=str(tmp_path / 'r'))
    assert ds.get_number_shards() == 1
    ds.reshard(8)
    assert ds.get_number_shards() == 4
    assert np.allclose(ds.X, X)


def test_disk_dataset_iterbatches_all_rows():
    X = np.arange(100).reshape(50, 2)
    ds = DiskDataset.from_numpy(X, np.arange(50))
    ds.reshard(12)
    seen = []
    for Xb, yb, wb, ib in ds.iterbatches(8, deterministic=True,
                                         pad_batches=False):
        seen.append(Xb)
    total = np.concatenate(seen)
    assert total.shape == (50, 2)
    assert set(map(tuple, total)) == set(map(tuple, X))


def test_disk_dataset_merge():
    a = DiskDataset.from_numpy(np.ones((5, 2)), np.ones(5))
    b = DiskDataset.from_numpy(np.zeros((3, 2)), np.zeros(3))
    m = DiskDataset.merge([a, b])
    assert len(m) == 8


def test_csv_loader(tmp_path):
    import pandas as pd
    df = pd.DataFrame({
        'smiles': ['CCO', 'CCC', 'c1ccccc1', 'not_a_smiles', 'CC(=O)O'],
        'task1': [1, 0, 1, 0, 1],
        'task2': [0, np.nan, 1, 1, 0],
    })
    p = str(tmp_path / 'test.csv')
    df.to_csv(p, index=False)
    loader = CSVLoader(['task1', 'task2'], CircularFingerprint(2, 128),
                       feature_field='smiles')
    ds = loader.create_dataset(p)
    assert len(ds) == 4                 # bad SMILES dropped
    assert ds.X.shape == (4, 128)
    # NaN label -> weight 0
    w = ds.w
    assert w[1, 1] == 0.0 and w[1, 0] == 1.0


def test_user_csv_loader(tmp_path):
    import pandas as pd
    df = pd.DataFrame({'id': ['a', 'b', 'c'], 'f1': [1., 2., 3.],
                       'f2': [4., 5., 6.], 'y': [0, 1, 0]})
    p = str(tmp_path / 'u.csv')
    df.to_csv(p, index=False)
    loader = UserCSVLoader(['y'], UserDefinedFeaturizer(['f1', 'f2']),
                           id_field='id')
    ds = loader.create_dataset(p)
    assert ds.X.shape == (3, 2)
    assert np.allclose(ds.X[:, 0], [1, 2, 3])


def test_in_memory_loader():
    loader = InMemoryLoader(['task1'], CircularFingerprint(2, 64))
    ds = loader.create_dataset([('CCO', 1), ('CCC', 0)], shard_size=2)
    assert len(ds) == 2
    assert ds.X.shape == (2, 64)


def test_sdf_loader():
    loader = SDFLoader(['LogP(RRCK)'], CircularFingerprint(2, 128))
    ds = loader.create_dataset(
        '/root/reference/datasets/membrane_permeability.sdf', shard_size=64)
    assert len(ds) > 100
    assert ds.X.shape[1] == 128
    assert np.isfinite(ds.y).all()


def test_fasta_loader(tmp_path):
    p = str(tmp_path / 'x.fasta')
    with open(p, 'w') as f:
        f.write('>seq1\nACGT\n>seq2\nGGGTT\n')
    ds = FASTALoader().create_dataset(p)
    assert len(ds) == 2
    assert ds.X[0].shape == (5, 5)


def test_graph_featurizer_in_disk_dataset(tmp_path):
    import pandas as pd
    df = pd.DataFrame({'smiles': ['CCO', 'c1ccccc1'], 'y': [1.0, 0.0]})
    p = str(tmp_path / 'g.csv')
    df.to_csv(p, index=False)
    loader = CSVLoader(['y'], ConvMolFeaturizer(), feature_field='smiles')
    ds = loader.create_dataset(p)
    X = ds.X
    assert X.dtype == object
    assert X[0].node_features.shape == (3, 75)


def test_databag():
    a = NumpyDataset(np.random.rand(6, 2), np.arange(6))
    b = NumpyDataset(np.random.rand(6, 3), np.arange(6))
    bag = Databag({'a': a, 'b': b})
    batch = next(bag.iterbatches(batch_size=3))
    assert batch['a'].shape == (3, 2)
    assert batch['b'].shape == (3, 3)


def test_dynamic_csv_molnet_loader(tmp_path):
    """Dynamic-task loaders (toxcast/pcba family) read the task list from
    the CSV header."""
    import pandas as pd
    csv = tmp_path / 'toxcast_data.csv.gz'
    pd.DataFrame({
        'smiles': ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'CCCC'],
        'assay_a': [1, 0, 1, 0, 1, 0],
        'assay_b': [0, 0, 1, 1, 0, 1],
    }).to_csv(csv, index=False, compression='gzip')
    from deepchem_tpu.molnet import load_toxcast
    tasks, (train, valid, test), tr = load_toxcast(
        featurizer='ecfp', splitter='random', data_dir=str(tmp_path),
        save_dir=str(tmp_path), reload=False)
    assert tasks == ['assay_a', 'assay_b']
    assert len(train) + len(valid) + len(test) == 6
    assert train.y.shape[1] == 2


def test_poly_wd_graph_utils():
    from deepchem_tpu.utils.poly_wd_graph_utils import (
        PolyWDGStringValidator, parse_polymer_rules, make_polymer_mol,
        tag_atoms_in_repeating_unit, remove_wildcard_atoms)
    v = PolyWDGStringValidator()
    assert v.validate('[1*]C.C[2*]|0.5|0.5|<1-2:0.5:0.5')
    info, dop = parse_polymer_rules(['1-2:0.3:0.7~100'])
    assert info == [('1', '2', 0.3, 0.7)] and abs(dop - 3.0) < 1e-9
    poly = make_polymer_mol('[1*]CC.CO[2*]', [0.5, 0.5], True, False)
    tagged, rmap = tag_atoms_in_repeating_unit(poly)
    assert set(rmap) == {'1', '2'}
    clean = remove_wildcard_atoms(tagged)
    assert clean.num_atoms == 4
    assert all(getattr(a, 'w_frag', None) == 0.5 for a in clean.atoms)
    with pytest.raises(ValueError):
        v.validate('C.C|0.5|<1-2:0.5:0.5')


def test_poly_wdg_featurizer():
    from deepchem_tpu.feat import PolyWDGFeaturizer
    g = PolyWDGFeaturizer().featurize(
        ['[1*]CC.CO[2*]|0.5|0.5|<1-2:0.3:0.7~50'])[0]
    assert g.node_features.shape == (4, 75)
    assert g.edge_index.shape == (2, 6)
    assert list(g.edge_weights) == [1.0, 1.0, 1.0, 1.0,
                                    pytest.approx(0.3),
                                    pytest.approx(0.7)]
    assert all(w == 0.5 for w in g.node_weights)
    # invalid strings come back as empty arrays (log-and-drop contract)
    out = PolyWDGFeaturizer().featurize(['not|a|polymer'])
    assert out[0].size == 0


def test_graphdata_interop():
    from deepchem_tpu.feat import MolGraphConvFeaturizer
    g = MolGraphConvFeaturizer(use_edges=True).featurize(['CCO'])[0]
    nx_g = g.to_networkx()
    assert nx_g.number_of_nodes() == 3 and nx_g.number_of_edges() == 4
    assert nx_g.nodes[0]['x'].shape == (30,)
    # dgl/pyg absent here: must raise informative ImportError
    with pytest.raises(ImportError):
        g.to_dgl_graph()
    with pytest.raises(ImportError):
        g.to_pyg_graph()


def test_data_utils_loaders(tmp_path):
    import pandas as pd
    from deepchem_tpu.utils.data_utils import (load_csv_files,
                                               load_sdf_files, load_data)
    csv = tmp_path / 'x.csv'
    pd.DataFrame({'a': range(10), 'b': range(10)}).to_csv(csv, index=False)
    shards = list(load_csv_files([str(csv)], shard_size=4))
    assert [len(s) for s in shards] == [4, 4, 2]
    sdf = list(load_sdf_files(
        ['/root/reference/datasets/membrane_permeability.sdf'],
        tasks=['LogP(RRCK)']))
    assert sum(len(s) for s in sdf) == 201
    assert 'smiles' in sdf[0].columns
    assert len(next(load_data([str(csv)]))) == 10


def test_graph_featurizers_handle_single_atom_molecules():
    """No graph featurizer may fail on bond-less molecules (methane,
    ammonium) — empty edge features must keep a stable width."""
    import logging
    logging.disable(logging.WARNING)
    from deepchem_tpu.feat import (ConvMolFeaturizer,
                                   MolGraphConvFeaturizer,
                                   PagtnMolGraphFeaturizer,
                                   RDKitConformerFeaturizer)
    try:
        for f in [ConvMolFeaturizer(), MolGraphConvFeaturizer(),
                  MolGraphConvFeaturizer(use_edges=True),
                  PagtnMolGraphFeaturizer(), RDKitConformerFeaturizer()]:
            out = f.featurize(['C', '[NH4+]', 'CCO'])
            fails = [i for i, x in enumerate(out)
                     if isinstance(x, np.ndarray) and x.size == 0]
            assert not fails, (type(f).__name__, fails)
    finally:
        logging.disable(logging.NOTSET)
