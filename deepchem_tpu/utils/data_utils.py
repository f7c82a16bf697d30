"""Data directory management and dataset persistence helpers.

TPU-native rework of reference deepchem/utils/data_utils.py:65-651 (get_data_dir,
download_url, save/load helpers).  Downloads degrade gracefully to local
mirrors because the build environment has no network egress.
"""

from __future__ import annotations

import gzip
import json
import logging
import os
import shutil
import tarfile
import zipfile
from typing import Any, List, Optional
from urllib.parse import urlparse

import numpy as np

logger = logging.getLogger(__name__)

# Local mirror directories searched when a download URL is unreachable.
_LOCAL_MIRRORS = [
    os.environ.get('DEEPCHEM_TPU_MIRROR', ''),
    '/root/reference/datasets',
    # benchmark CSVs shipped under the reference examples tree
    '/root/reference/examples/toxcast/processing',
    '/root/reference/examples/hiv',
    '/root/reference/examples/clintox/datasets',
    '/root/reference/examples/sider',
]


def get_data_dir() -> str:
    """Return the global cache directory for datasets.

    Honors ``DEEPCHEM_DATA_DIR`` like the reference
    (deepchem/utils/data_utils.py:65).
    """
    d = os.environ.get('DEEPCHEM_DATA_DIR')
    if d:
        os.makedirs(d, exist_ok=True)
        return d
    d = os.path.join(os.path.expanduser('~'), '.deepchem_tpu')
    os.makedirs(d, exist_ok=True)
    return d


def download_url(url: str, dest_dir: Optional[str] = None,
                 name: Optional[str] = None) -> str:
    """Fetch ``url`` into ``dest_dir`` (default: data dir); returns local path.

    Mirrors reference download_url (data_utils.py:80) but first consults local
    mirror directories so the framework works with zero egress.
    """
    if dest_dir is None:
        dest_dir = get_data_dir()
    if name is None:
        name = os.path.basename(urlparse(url).path)
    dest = os.path.join(dest_dir, name)
    if os.path.exists(dest):
        return dest
    for mirror in _LOCAL_MIRRORS:
        if mirror and os.path.exists(os.path.join(mirror, name)):
            os.makedirs(dest_dir, exist_ok=True)
            shutil.copy(os.path.join(mirror, name), dest)
            logger.info('using local mirror for %s', name)
            return dest
    import urllib.request
    os.makedirs(dest_dir, exist_ok=True)
    logger.info('downloading %s', url)
    urllib.request.urlretrieve(url, dest)
    return dest


def untargz_file(path: str, dest_dir: str) -> None:
    with tarfile.open(path) as t:
        t.extractall(dest_dir)


def unzip_file(path: str, dest_dir: str) -> None:
    with zipfile.ZipFile(path) as z:
        z.extractall(dest_dir)


def save_to_disk(obj: Any, filename: str, compress: int = 3) -> None:
    """Persist a Python object (numpy arrays use joblib like the reference,
    data_utils.py:488)."""
    import joblib
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    joblib.dump(obj, filename, compress=compress)


def load_from_disk(filename: str) -> Any:
    import joblib
    name = filename
    if os.path.splitext(name)[1] == '.gz':
        name = os.path.splitext(name)[0]
    ext = os.path.splitext(name)[1]
    if ext == '.npy':
        return np.load(filename, allow_pickle=True)
    if ext == '.csv':
        import pandas as pd
        df = pd.read_csv(filename)
        df = df.replace(np.nan, str(''), regex=True)
        return df
    return joblib.load(filename)


def save_dataset_to_disk(save_dir: str, train, valid, test,
                         transformers: List) -> None:
    """Persist a (train, valid, test) split + its transformers (reference
    data_utils.py:594)."""
    from deepchem_tpu.data import DiskDataset
    for name, ds in (('train', train), ('valid', valid), ('test', test)):
        ds.move(os.path.join(save_dir, f'{name}_dir'))
    save_transformers(save_dir, transformers)


def load_dataset_from_disk(save_dir: str):
    """Load a persisted split; returns (loaded, (train, valid, test),
    transformers) like reference data_utils.py:540."""
    from deepchem_tpu.data import DiskDataset
    dirs = [os.path.join(save_dir, f'{n}_dir')
            for n in ('train', 'valid', 'test')]
    if not all(os.path.isdir(d) for d in dirs):
        return False, None, list()
    try:
        datasets = tuple(DiskDataset(d) for d in dirs)
    except (OSError, ValueError):
        return False, None, list()
    transformers = load_transformers(save_dir)
    return True, datasets, transformers


def save_transformers(save_dir: str, transformers: List) -> None:
    save_to_disk(transformers, os.path.join(save_dir, 'transformers.pkl'))


def load_transformers(save_dir: str) -> List:
    path = os.path.join(save_dir, 'transformers.pkl')
    if os.path.exists(path):
        return load_from_disk(path)
    return []


def pad_array(x: np.ndarray, shape, fill: float = 0.0) -> np.ndarray:
    """Zero-pad an array up to ``shape`` (reference utils/data_utils.py
    pad_array)."""
    if np.isscalar(shape):
        shape = (shape,)
    out = np.full(shape, fill, dtype=x.dtype)
    sl = tuple(slice(0, min(a, b)) for a, b in zip(x.shape, shape))
    out[sl] = x[sl]
    return out


def load_csv_files(filenames: List[str], shard_size: Optional[int] = None):
    """Yield pandas DataFrame shards from CSV files (reference
    data_utils.load_csv_files)."""
    import pandas as pd
    for fname in filenames:
        if shard_size is None:
            yield pd.read_csv(fname)
        else:
            for df in pd.read_csv(fname, chunksize=shard_size):
                yield df.reset_index(drop=True)


def load_json_files(filenames: List[str], shard_size: Optional[int] = None):
    """Yield DataFrame shards from line-delimited JSON (reference
    data_utils.load_json_files)."""
    import pandas as pd
    for fname in filenames:
        if shard_size is None:
            yield pd.read_json(fname, orient='records', lines=True)
        else:
            for df in pd.read_json(fname, orient='records', lines=True,
                                   chunksize=shard_size):
                yield df.reset_index(drop=True)


def load_sdf_files(filenames: List[str], clean_mols: bool = True,
                   tasks: Optional[List[str]] = None,
                   shard_size: Optional[int] = None):
    """Yield DataFrame shards from SDF files with mol objects + properties
    (reference data_utils.load_sdf_files; uses the in-repo SDF reader)."""
    import pandas as pd
    from deepchem_tpu.chem import parse_sdf, mol_to_smiles
    tasks = tasks or []
    rows: List[dict] = []
    for fname in filenames:
        opener = gzip.open if fname.endswith('.gz') else open
        with opener(fname, 'rt') as f:
            text = f.read()
        for mol, props in parse_sdf(text):
            if mol is None and clean_mols:
                continue
            row = {'mol': mol,
                   'smiles': mol_to_smiles(mol) if mol is not None else ''}
            for t in tasks:
                row[t] = props.get(t)
            rows.append(row)
            if shard_size and len(rows) >= shard_size:
                yield pd.DataFrame(rows)
                rows = []
    if rows:
        yield pd.DataFrame(rows)


def load_image_files(filenames: List[str]) -> np.ndarray:
    """Stack image files into one array (reference
    data_utils.load_image_files; requires PIL)."""
    from PIL import Image
    return np.stack([np.array(Image.open(f)) for f in filenames])


def load_pickle_file(filename: str):
    """(reference data_utils.load_pickle_file; handles .gz)"""
    import pickle
    opener = gzip.open if filename.endswith('.gz') else open
    with opener(filename, 'rb') as f:
        return pickle.load(f)


def load_pickle_files(filenames: List[str]):
    for f in filenames:
        yield load_pickle_file(f)


def load_data(filenames: List[str], shard_size: Optional[int] = None):
    """Dispatch on extension (reference data_utils.load_data)."""
    if not filenames:
        return
    name = filenames[0]
    base = name[:-3] if name.endswith('.gz') else name
    ext = os.path.splitext(base)[1].lower()
    if ext == '.csv':
        yield from load_csv_files(filenames, shard_size)
    elif ext == '.json':
        yield from load_json_files(filenames, shard_size)
    elif ext == '.sdf':
        yield from load_sdf_files(filenames, shard_size=shard_size)
    elif ext in ('.pkl', '.pickle'):
        yield from load_pickle_files(filenames)
    else:
        raise ValueError(f'unsupported file type {ext!r}')


def remove_missing_entries(dataset) -> None:
    """Drop rows whose X/y/w contain missing values, shard-wise, in place
    (reference data_utils.remove_missing_entries)."""
    for i, (X, y, w, ids) in enumerate(dataset.itershards()):
        available_rows = np.ones(len(X), dtype=bool)
        for arr in (X, y, w):
            if arr is None:
                continue
            flat = np.asarray(
                [np.any(pd_isnull(row)) for row in arr])
            available_rows &= ~flat
        dataset.set_shard(i, X[available_rows],
                          None if y is None else y[available_rows],
                          None if w is None else w[available_rows],
                          ids[available_rows])


def pd_isnull(x) -> np.ndarray:
    import pandas as pd
    try:
        return np.asarray(pd.isnull(x))
    except Exception:
        return np.zeros(np.shape(x), dtype=bool)
