"""Dataset explorer: embedding-based semantic search over a dataset.

Behavioral spec: reference ultralytics/data/explorer/explorer.py:55-400 —
per-image embeddings, similarity search, SQL-style filtering, similarity
index. The reference stores embeddings in LanceDB and queries via duckdb;
neither is in this environment, so the store is a plain npz + numpy cosine
search with a predicate-based filter (same user-visible operations).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


class Explorer:
    def __init__(self, data: str, model: Optional[str] = "yolov10n.yaml", imgsz: int = 224):
        from .dataset import YOLODataset, check_det_dataset

        self.info = check_det_dataset(data)
        self.dataset = YOLODataset(
            self.info.get("train") or self.info["val"], imgsz=imgsz, names=self.info.get("names")
        )
        self.imgsz = imgsz
        self.model_name = model
        self.embeddings: Optional[np.ndarray] = None
        self.progress = 0.0  # embedding-build progress in [0, 1] (reference explorer.py .progress)
        self._embed_fn = None

    def _build_embedder(self):
        from ..engine.model import _resolve_yaml
        from ..nn import build_model

        model = build_model(_resolve_yaml(self.model_name))
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
        )()

        # headless graph: run the compiled layer list up to the SPPF output and
        # global-average-pool it as the embedding (the reference embeds with the
        # model's penultimate features too).
        specs_no_head = model.specs[: -1]
        from ..nn.compiler import DetectionModel

        trunk = DetectionModel(
            specs=specs_no_head, save=model.save, nc=model.nc, strides=model.strides
        )
        tvars = {
            "params": {k: v for k, v in variables["params"].items() if k in {f"model_{s.i}" for s in specs_no_head}},
            "batch_stats": {k: v for k, v in variables["batch_stats"].items() if k in {f"model_{s.i}" for s in specs_no_head}},
        }

        @jax.jit
        def embed(img_u8):
            x = img_u8.astype(jnp.float32)[..., ::-1] / 255.0
            feat = trunk.apply(tvars, x, training=False)
            emb = jnp.mean(feat, axis=(1, 2))
            return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-20)

        return embed

    def create_embeddings_table(self, force: bool = False, cache: bool = True) -> np.ndarray:
        """Compute (or load) per-image embeddings (explorer.py create_embeddings_table)."""
        base = self.dataset.img_path
        cache_path = Path(base[0] if isinstance(base, list) else base).with_suffix(".embeddings.npz")
        if cache and cache_path.exists() and not force:
            z = np.load(cache_path)
            if len(z["emb"]) == len(self.dataset):
                self.embeddings = z["emb"]
                self.progress = 1.0
                return self.embeddings
        import cv2

        if self._embed_fn is None:
            self._embed_fn = self._build_embedder()
        embs = []
        for i in range(len(self.dataset)):
            im = cv2.resize(self.dataset.load_image(i), (self.imgsz, self.imgsz))
            embs.append(np.asarray(self._embed_fn(jnp.asarray(im[None]))[0]))
            self.progress = (i + 1) / len(self.dataset)
        self.embeddings = np.stack(embs)
        if cache:
            try:
                np.savez_compressed(cache_path, emb=self.embeddings)
            except OSError:
                pass
        return self.embeddings

    def get_similar(self, img_idx: int = 0, limit: int = 9) -> List[Dict]:
        """Nearest neighbors by cosine similarity (explorer.py get_similar)."""
        if self.embeddings is None:
            self.create_embeddings_table()
        q = self.embeddings[img_idx]
        sims = self.embeddings @ q
        order = np.argsort(-sims)[:limit]
        return [
            {"idx": int(i), "im_file": self.dataset.im_files[i], "similarity": float(sims[i])}
            for i in order
        ]

    def similarity_index(self, top_k: int = 5, sim_thres: float = 0.9) -> List[Dict]:
        """Per-image list of near-duplicates (explorer.py similarity_index)."""
        if self.embeddings is None:
            self.create_embeddings_table()
        sims = self.embeddings @ self.embeddings.T
        np.fill_diagonal(sims, -1)
        out = []
        for i in range(len(sims)):
            nn_idx = np.argsort(-sims[i])[:top_k]
            close = [int(j) for j in nn_idx if sims[i, j] >= sim_thres]
            out.append({"idx": i, "im_file": self.dataset.im_files[i], "similar": close})
        return out

    def query(self, predicate: Callable[[Dict], bool]) -> List[Dict]:
        """Filter images by a label predicate — the SQL-query analog
        (explorer.py sql_query); predicate sees {'im_file', 'cls', 'bboxes'}."""
        rows = []
        for f, lab in zip(self.dataset.im_files, self.dataset.labels):
            row = {"im_file": f, "cls": lab["cls"], "bboxes": lab["bboxes"]}
            if predicate(row):
                rows.append(row)
        return rows

    def sql_query(self, query: str) -> List[Dict]:
        """SQL-like query over the embeddings table (reference
        explorer.py:173 sql_query, which pushes predicates into LanceDB via
        duckdb — absent from this environment, so a small predicate compiler
        evaluates the same grammar in-process).

        Supported grammar (the patterns the reference documents):
          SELECT * FROM 'table' [WHERE <cond>] [LIMIT n]
          <cond> := <cond> AND <cond> | <cond> OR <cond> | ( <cond> )
                  | labels LIKE '%name%' | <field> <op> <value>
          <field>: labels (class-name list), n_labels, im_file
          <op>: = != > >= < <=
        """
        import re

        q = query.strip().rstrip(";")
        m = re.match(r"(?is)^select\s+\*\s+from\s+'?table'?\s*(?:where\s+(.*?))?\s*(?:limit\s+(\d+))?$", q)
        if not m:
            raise ValueError(f"unsupported SQL (SELECT * FROM 'table' [WHERE ...] [LIMIT n]): {query}")
        cond_src, limit = m.group(1), m.group(2)

        names = {int(k): str(v) for k, v in (self.dataset.names or {}).items()}

        def row_env(f, lab):
            cls_ids = [int(c) for c in np.asarray(lab["cls"]).flatten()]
            return {
                "im_file": f,
                "labels": [names.get(c, str(c)) for c in cls_ids],
                "n_labels": len(cls_ids),
                "cls": cls_ids,
            }

        def compile_cond(src):
            # tokenize: parens, AND/OR, comparisons, LIKE
            tokens = re.findall(r"\(|\)|'[^']*'|[^\s()]+", src)

            def parse_or(pos):
                node, pos = parse_and(pos)
                while pos < len(tokens) and tokens[pos].upper() == "OR":
                    rhs, pos = parse_and(pos + 1)
                    node = (lambda l, r: lambda e: l(e) or r(e))(node, rhs)
                return node, pos

            def parse_and(pos):
                node, pos = parse_atom(pos)
                while pos < len(tokens) and tokens[pos].upper() == "AND":
                    rhs, pos = parse_atom(pos + 1)
                    node = (lambda l, r: lambda e: l(e) and r(e))(node, rhs)
                return node, pos

            def parse_atom(pos):
                if tokens[pos] == "(":
                    node, pos = parse_or(pos + 1)
                    assert tokens[pos] == ")", "unbalanced parens"
                    return node, pos + 1
                field, op = tokens[pos], tokens[pos + 1].upper()
                rhs = tokens[pos + 2]
                val = rhs[1:-1] if rhs.startswith("'") else rhs
                if op == "LIKE":
                    pat = val.strip("%")

                    def like(e, f=field, p=pat):
                        v = e.get(f)
                        if isinstance(v, list):
                            return any(p in str(x) for x in v)
                        return p in str(v)

                    return like, pos + 3
                import operator as _op

                ops = {"=": _op.eq, "!=": _op.ne, ">": _op.gt, ">=": _op.ge,
                       "<": _op.lt, "<=": _op.le}
                assert op in ops, f"unsupported operator {op}"
                fn = ops[op]

                def cmp(e, f=field, fn=fn, v=val):
                    lhs = e.get(f)
                    if isinstance(lhs, list) and f == "cls":
                        return any(fn(float(x), float(v)) for x in lhs)
                    try:
                        return fn(float(lhs), float(v))
                    except (TypeError, ValueError):
                        return fn(str(lhs), str(v))

                return cmp, pos + 3

            node, pos = parse_or(0)
            assert pos == len(tokens), f"trailing tokens: {tokens[pos:]}"
            return node

        pred = compile_cond(cond_src) if cond_src else (lambda e: True)
        rows = []
        for f, lab in zip(self.dataset.im_files, self.dataset.labels):
            env = row_env(f, lab)
            if pred(env):
                rows.append(env)
                if limit and len(rows) >= int(limit):
                    break
        return rows
