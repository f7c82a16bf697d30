"""File -> featurized DiskDataset loaders.

Redesign of reference deepchem/data/data_loader.py (2171 LoC): the
shard-at-a-time create_dataset pipeline (:72,177,242,265) with CSV / SDF /
JSON / FASTA / in-memory frontends.  Featurization of a shard fans out over a
process pool to keep TPU featurization throughput up (reference hot loop #1
is a serial Python loop; SURVEY.md section 7 'hard parts').
"""

from __future__ import annotations

import logging
import os
import tempfile
from typing import Any, Iterable, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

from deepchem_tpu.data.datasets import DiskDataset, NumpyDataset, ImageDataset
from deepchem_tpu.feat.base import Featurizer, UserDefinedFeaturizer

logger = logging.getLogger(__name__)


def _filter_valid(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Drop failed featurizations (empty arrays); re-stack to numeric if the
    survivors are uniform."""
    valid = np.array([
        f is not None and (not isinstance(f, np.ndarray) or f.size > 0)
        for f in feats], dtype=bool)
    kept = feats[valid]
    if kept.dtype == object and len(kept):
        first = kept[0]
        if all(isinstance(f, np.ndarray)
               and f.shape == getattr(first, 'shape', None)
               and f.dtype.kind in 'fiub' for f in kept):
            kept = np.stack(list(kept))
    return kept, np.nonzero(valid)[0]


def _lookahead(gen: Iterator, depth: int = 1) -> Iterator:
    """Run a generator one item ahead in a thread so shard featurization
    (CPU pool) overlaps DiskDataset shard WRITES (joblib compression) —
    the streaming half of SURVEY section 7's 'multiprocess feature
    workers feeding shard writers'."""
    import queue
    import threading
    q: 'queue.Queue' = queue.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for item in gen:
                q.put(item)
            q.put(_END)
        except BaseException as e:
            q.put(e)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _convert_df_to_numpy(df, tasks: Sequence[str]) -> Tuple[np.ndarray,
                                                            np.ndarray]:
    """Extract (y, w) from dataframe task columns; missing values get w=0
    (reference data_loader.py:40 _convert_df_to_numpy)."""
    import pandas as pd
    n = len(df)
    n_tasks = len(tasks)
    y = np.zeros((n, n_tasks), dtype=float)
    w = np.ones((n, n_tasks), dtype=float)
    for i, task in enumerate(tasks):
        col = df[task]
        vals = pd.to_numeric(col, errors='coerce')
        missing = vals.isna().to_numpy()
        y[:, i] = np.nan_to_num(vals.to_numpy(dtype=float), nan=0.0)
        w[:, i] = (~missing).astype(float)
    return y, w


class DataLoader:
    """Abstract loader: file(s) -> DiskDataset, one shard at a time
    (reference data_loader.py:72)."""

    def __init__(self, tasks: Sequence[str],
                 featurizer: Featurizer,
                 id_field: Optional[str] = None,
                 log_every_n: int = 1000,
                 n_jobs: Optional[int] = None):
        if not isinstance(tasks, (list, tuple)):
            raise ValueError('tasks must be a list of task names')
        self.tasks = list(tasks)
        self.featurizer = featurizer
        self.id_field = id_field
        self.log_every_n = log_every_n
        #: featurization process-pool width; None = all cores (VERDICT
        #: r2 item 5: n_jobs was previously never plumbed from the
        #: loaders into feat/base.py's pool)
        self.n_jobs = os.cpu_count() if n_jobs is None else n_jobs
        self.user_specified_features = None
        if isinstance(featurizer, UserDefinedFeaturizer):
            self.user_specified_features = featurizer.feature_fields

    def featurize(self, inputs, data_dir=None, shard_size=8192):
        """Alias kept for reference-API compatibility
        (data_loader.py:164)."""
        return self.create_dataset(inputs, data_dir, shard_size)

    def _featurize(self, inputs):
        """Run the featurizer over one shard's raw inputs with the
        loader's pool width (hot loop #1)."""
        try:
            return self.featurizer.featurize(
                inputs, log_every_n=self.log_every_n,
                n_jobs=self.n_jobs)
        except TypeError:
            # featurizers with custom signatures (no n_jobs support)
            return self.featurizer.featurize(
                inputs, log_every_n=self.log_every_n)

    def create_dataset(self, inputs: Union[str, Sequence],
                       data_dir: Optional[str] = None,
                       shard_size: Optional[int] = 8192) -> DiskDataset:
        if isinstance(inputs, (str, os.PathLike)):
            inputs = [inputs]

        def shard_generator():
            for shard_num, shard in enumerate(
                    self._get_shards(list(inputs), shard_size)):
                X, valid = self._featurize_shard(shard)
                ids = self._shard_ids(shard)[valid]
                if len(self.tasks) > 0:
                    y, w = self._shard_labels(shard)
                    y, w = y[valid], w[valid]
                else:
                    y, w = None, None
                logger.info('featurized shard %d (%d/%d valid)',
                            shard_num, len(X), len(valid))
                yield X, y, w, ids
        return DiskDataset.create_dataset(
            _lookahead(shard_generator()), data_dir, self.tasks)

    # subclass hooks -------------------------------------------------------
    def _get_shards(self, inputs: List, shard_size: Optional[int]):
        raise NotImplementedError

    def _featurize_shard(self, shard) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    def _shard_ids(self, shard) -> np.ndarray:
        raise NotImplementedError

    def _shard_labels(self, shard) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError


class CSVLoader(DataLoader):
    """CSV -> featurized DiskDataset (reference data_loader.py:281).

    ``feature_field`` names the column holding the featurizer input
    (e.g. 'smiles').
    """

    def __init__(self, tasks: Sequence[str], featurizer: Featurizer,
                 feature_field: Optional[str] = None,
                 id_field: Optional[str] = None,
                 smiles_field: Optional[str] = None,
                 log_every_n: int = 1000,
                 n_jobs: Optional[int] = None):
        if smiles_field is not None:
            logger.warning('smiles_field is deprecated; use feature_field')
            if feature_field is None:
                feature_field = smiles_field
        super().__init__(tasks, featurizer, id_field, log_every_n,
                         n_jobs=n_jobs)
        self.feature_field = feature_field
        if id_field is None:
            self.id_field = feature_field

    def _get_shards(self, inputs, shard_size):
        import pandas as pd
        for path in inputs:
            if shard_size is None:
                yield pd.read_csv(path)
            else:
                yield from pd.read_csv(path, chunksize=shard_size)

    def _featurize_shard(self, shard):
        inputs = shard[self.feature_field].values
        feats = self._featurize(inputs)
        return _filter_valid(feats)

    def _shard_ids(self, shard):
        return shard[self.id_field].values \
            if self.id_field else np.asarray(shard.index)

    def _shard_labels(self, shard):
        return _convert_df_to_numpy(shard, self.tasks)


class UserCSVLoader(CSVLoader):
    """CSV with precomputed feature columns (reference
    data_loader.py:439)."""

    def _featurize_shard(self, shard):
        assert isinstance(self.featurizer, UserDefinedFeaturizer)
        cols = self.featurizer.feature_fields
        X = shard[cols].to_numpy().astype(float)
        return X, np.arange(len(X))


class JsonLoader(DataLoader):
    """JSON-lines / records -> DiskDataset (reference
    data_loader.py:531)."""

    def __init__(self, tasks, featurizer, feature_field,
                 id_field=None, label_field=None, weight_field=None,
                 log_every_n: int = 1000, n_jobs=None):
        super().__init__(tasks, featurizer, id_field, log_every_n,
                         n_jobs=n_jobs)
        self.feature_field = feature_field
        self.label_field = label_field
        self.weight_field = weight_field

    def _get_shards(self, inputs, shard_size):
        import pandas as pd
        for path in inputs:
            df = pd.read_json(path, orient='records', lines=True)
            if shard_size is None:
                yield df
            else:
                for start in range(0, len(df), shard_size):
                    yield df.iloc[start:start + shard_size]

    def _featurize_shard(self, shard):
        feats = self._featurize(shard[self.feature_field].values)
        return _filter_valid(feats)

    def _shard_ids(self, shard):
        return shard[self.id_field].values \
            if self.id_field else np.asarray(shard.index)

    def _shard_labels(self, shard):
        return _convert_df_to_numpy(shard, self.tasks)


class SDFLoader(DataLoader):
    """SDF -> DiskDataset; task values come from SDF properties (reference
    data_loader.py:733)."""

    def __init__(self, tasks, featurizer, sanitize: bool = False,
                 log_every_n: int = 1000, n_jobs=None):
        super().__init__(tasks, featurizer, None, log_every_n,
                         n_jobs=n_jobs)
        self.sanitize = sanitize

    def _get_shards(self, inputs, shard_size):
        from deepchem_tpu.chem import parse_sdf
        buf = []
        for path in inputs:
            with open(path) as f:
                text = f.read()
            for mol, props in parse_sdf(text):
                buf.append((mol, props))
                if shard_size is not None and len(buf) >= shard_size:
                    yield buf
                    buf = []
        if buf:
            yield buf

    def _featurize_shard(self, shard):
        mols = [m for m, _ in shard]
        feats = self._featurize(mols)
        return _filter_valid(feats)

    def _shard_ids(self, shard):
        from deepchem_tpu.chem import mol_to_smiles
        ids = []
        for mol, props in shard:
            try:
                ids.append(mol_to_smiles(mol) if mol is not None else '')
            except Exception:
                ids.append('')
        return np.asarray(ids, dtype=object)

    def _shard_labels(self, shard):
        n = len(shard)
        y = np.zeros((n, len(self.tasks)))
        w = np.ones((n, len(self.tasks)))
        for j, (_, props) in enumerate(shard):
            for i, task in enumerate(self.tasks):
                v = props.get(task, '')
                try:
                    y[j, i] = float(v)
                except (TypeError, ValueError):
                    w[j, i] = 0.0
        return y, w


class FASTALoader(DataLoader):
    """FASTA -> one-hot sequence dataset (reference data_loader.py:922)."""

    def __init__(self, featurizer: Optional[Featurizer] = None,
                 auto_add_annotations: bool = False,
                 legacy: bool = False):
        self.featurizer = featurizer
        self.tasks: List[str] = []
        self.auto_add_annotations = auto_add_annotations
        self.id_field = None
        self.log_every_n = 1000

    def create_dataset(self, inputs, data_dir=None, shard_size=None):
        if isinstance(inputs, (str, os.PathLike)):
            inputs = [inputs]
        seqs, ids = [], []
        for path in inputs:
            header = None
            chunks: List[str] = []
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line.startswith('>'):
                        if header is not None:
                            seqs.append(''.join(chunks))
                            ids.append(header)
                        header = line[1:]
                        chunks = []
                    elif line:
                        chunks.append(line)
            if header is not None:
                seqs.append(''.join(chunks))
                ids.append(header)
        if self.featurizer is not None:
            X = self.featurizer.featurize(seqs)
        else:
            X = _one_hot_dna(seqs)
        return DiskDataset.from_numpy(
            X, ids=np.asarray(ids, dtype=object), data_dir=data_dir)


def _one_hot_dna(seqs: Sequence[str]) -> np.ndarray:
    """A/C/G/T/N one-hot, padded to max length."""
    charmap = {'A': 0, 'C': 1, 'G': 2, 'T': 3}
    L = max((len(s) for s in seqs), default=0)
    out = np.zeros((len(seqs), L, 5), dtype=np.float32)
    for i, s in enumerate(seqs):
        for j, c in enumerate(s.upper()):
            out[i, j, charmap.get(c, 4)] = 1.0
    return out


class FASTQLoader(DataLoader):
    """FASTQ sequences (reference data_loader.py:1127)."""

    def __init__(self, featurizer: Optional[Featurizer] = None):
        self.featurizer = featurizer
        self.tasks = []
        self.id_field = None
        self.log_every_n = 1000

    def create_dataset(self, inputs, data_dir=None, shard_size=None):
        if isinstance(inputs, (str, os.PathLike)):
            inputs = [inputs]
        seqs, ids = [], []
        for path in inputs:
            with open(path) as f:
                lines = [ln.strip() for ln in f]
            for i in range(0, len(lines) - 3, 4):
                ids.append(lines[i][1:])
                seqs.append(lines[i + 1])
        if self.featurizer is not None:
            X = self.featurizer.featurize(seqs)
        else:
            X = _one_hot_dna(seqs)
        return DiskDataset.from_numpy(
            X, ids=np.asarray(ids, dtype=object), data_dir=data_dir)


class ImageLoader(DataLoader):
    """Image files / zips -> ImageDataset (reference
    data_loader.py:1303)."""

    def __init__(self, tasks: Optional[Sequence[str]] = None,
                 sorting: bool = True):
        self.tasks = list(tasks) if tasks else []
        self.sorting = sorting

    def create_dataset(self, inputs, data_dir=None, shard_size=8192,
                       in_memory: bool = False):
        if isinstance(inputs, tuple):
            if len(inputs) == 3:
                files, labels, weights = inputs
            elif len(inputs) == 2:
                files, labels = inputs
                weights = None
            else:
                raise ValueError('inputs tuple must be (files, labels[, w])')
        else:
            files, labels, weights = inputs, None, None
        if isinstance(files, str):
            files = [files]
        image_files = []
        for f in files:
            image_files += self._expand(f)
        if self.sorting and not isinstance(inputs, tuple):
            image_files = sorted(image_files)
        if isinstance(labels, str):
            # labels given as a zip/dir of mask images (segmentation
            # datasets, reference data_loader.py ImageLoader zip handling)
            from PIL import Image
            mask_files = self._expand(labels)
            if self.sorting:
                mask_files = sorted(mask_files)
            labels = np.stack([np.asarray(Image.open(m))
                               for m in mask_files])
        return ImageDataset(np.asarray(image_files, dtype=object),
                            labels, weights,
                            ids=np.asarray(image_files, dtype=object))

    def _expand(self, f: str):
        """dir -> contained files; zip -> extracted image files; file ->
        itself (reference data_loader.py:1303 accepts zips)."""
        import tempfile
        import zipfile
        if os.path.isdir(f):
            names = os.listdir(f)
            if self.sorting:
                names = sorted(names)
            return [os.path.join(f, n) for n in names]
        if zipfile.is_zipfile(f):
            with zipfile.ZipFile(f) as z:
                names = [n for n in z.namelist() if n.lower().endswith(
                    ('.png', '.jpg', '.jpeg', '.tif', '.tiff'))]
                if self.sorting:
                    names = sorted(names)
                tmp = tempfile.mkdtemp(prefix='dctpu-img-')
                z.extractall(tmp, members=names)
            return [os.path.join(tmp, n) for n in names]
        return [f]


class InMemoryLoader(DataLoader):
    """Featurize directly from in-memory lists (reference
    data_loader.py:1579)."""

    def create_dataset(self, inputs: Sequence[Any],
                       data_dir: Optional[str] = None,
                       shard_size: Optional[int] = 8192) -> DiskDataset:
        inputs = list(inputs)

        def shard_generator():
            size = shard_size or len(inputs) or 1
            for start in range(0, len(inputs), size):
                rows = inputs[start:start + size]
                datapoints, ys, ws, ids = [], [], [], []
                for i, row in enumerate(rows):
                    if isinstance(row, tuple):
                        row = list(row)
                    elif not isinstance(row, list):
                        row = [row]
                    x = row[0]
                    y = row[1] if len(row) > 1 else np.zeros(len(self.tasks))
                    w = row[2] if len(row) > 2 else np.ones(len(self.tasks))
                    sid = row[3] if len(row) > 3 else start + i
                    datapoints.append(x)
                    ys.append(y)
                    ws.append(w)
                    ids.append(sid)
                X = self.featurizer.featurize(
                    datapoints, log_every_n=self.log_every_n)
                X_kept, valid = _filter_valid(X)
                yield (X_kept, np.asarray(ys)[valid],
                       np.asarray(ws)[valid],
                       np.asarray(ids, dtype=object)[valid])
        return DiskDataset.create_dataset(shard_generator(), data_dir,
                                          self.tasks)


class DFTYamlLoader(DataLoader):
    """Load DFT entries from YAML (reference data_loader.py:1772).

    Each record: ``e_type`` ('ae' atomization / 'ie' / 'e'), ``true_val``
    (Hartree), and ``systems`` (list of dicts with a DQC-style
    ``moldesc``).  X holds :class:`deepchem_tpu.dft.scf.DFTEntry`
    objects ready for the in-repo SCF driver (dft/scf.py), y the true
    values.
    """

    def __init__(self, log_every_n: int = 1000, **entry_kwargs):
        self.tasks = ['true_val']
        self.featurizer = None
        self.id_field = None
        self.log_every_n = log_every_n
        self.user_specified_features = None
        self.entry_kwargs = entry_kwargs

    def create_dataset(self, inputs, data_dir=None,
                       shard_size: Optional[int] = 8192):
        import yaml
        from deepchem_tpu.dft.scf import DFTEntry
        if isinstance(inputs, (str, os.PathLike)):
            inputs = [inputs]
        entries, ys = [], []
        for path in inputs:
            with open(path) as f:
                records = yaml.safe_load(f) or []
            for rec in records:
                e_type = rec['e_type']
                true_val = rec['true_val']
                if e_type not in ('dm', 'dens'):
                    true_val = float(true_val)
                entries.append(DFTEntry(
                    e_type, true_val, rec['systems'],
                    weight=float(rec.get('weight', 1.0)),
                    **self.entry_kwargs))
                ys.append(float(true_val)
                          if e_type not in ('dm', 'dens') else 0.0)
        X = np.empty(len(entries), dtype=object)
        X[:] = entries
        y = np.asarray(ys).reshape(-1, 1)
        from deepchem_tpu.data.datasets import NumpyDataset
        return NumpyDataset(X, y, np.ones_like(y),
                            np.arange(len(entries)))


class SAMLoader(DataLoader):
    """Load aligned reads from SAM files (reference data_loader.py:1902).

    X rows are the SAMFeaturizer's 7-column record layout; y/w are
    zero/one placeholders like the reference's."""

    _default_featurizer = 'SAM'
    _read_mode = 'sam'

    def __init__(self, featurizer=None):
        if featurizer is None:
            from deepchem_tpu.feat.bio_seq_featurizer import SAMFeaturizer
            featurizer = SAMFeaturizer()
        self.featurizer = featurizer
        self.tasks = []
        self.user_specified_features = None

    def create_dataset(self, inputs, data_dir=None,
                       shard_size: Optional[int] = None):
        from deepchem_tpu.data.datasets import DiskDataset
        if isinstance(inputs, (str, os.PathLike)):
            inputs = [inputs]

        def shard_generator():
            for path in inputs:
                X = self.featurizer.featurize(path)
                n = len(X)
                yield X, np.zeros((n, 1)), np.ones((n, 1)), np.arange(n)
        return DiskDataset.create_dataset(shard_generator(), data_dir)


class BAMLoader(SAMLoader):
    """Load aligned reads from BAM files (reference data_loader.py:1993);
    uses the in-repo pure-Python BGZF/BAM reader when pysam is absent."""

    def __init__(self, featurizer=None, get_pileup: bool = False):
        if featurizer is None:
            from deepchem_tpu.feat.bio_seq_featurizer import BAMFeaturizer
            featurizer = BAMFeaturizer(get_pileup=get_pileup)
        super().__init__(featurizer)


class CRAMLoader(SAMLoader):
    """Load aligned reads from CRAM files (reference
    data_loader.py:2087); decoded by the in-repo pure-Python CRAM 3.0
    reader (``utils/cramlib.py``), no pysam needed."""

    def __init__(self, featurizer=None):
        if featurizer is None:
            from deepchem_tpu.feat.bio_seq_featurizer import CRAMFeaturizer
            featurizer = CRAMFeaturizer()
        super().__init__(featurizer)
