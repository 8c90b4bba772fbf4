"""Evaluation metrics and report tooling.

Re-designs `CViT-main/figure/ROC_AUC_ACC.py` (prediction-CSV × metadata.json
join → accuracy + ROC/AUC) and the S3D test metrics (`S3D-test.py:293-303`:
accuracy, F1, BCE loss, ROC dumps).
"""
from __future__ import annotations

import json
from typing import Dict, Sequence

import numpy as np


def roc_auc(labels: Sequence[int], scores: Sequence[float]):
    from sklearn import metrics
    fpr, tpr, thr = metrics.roc_curve(labels, scores)
    return fpr, tpr, thr, metrics.auc(fpr, tpr)


def f1(labels: Sequence[int], preds: Sequence[int]) -> float:
    from sklearn.metrics import f1_score
    return float(f1_score(labels, preds))


def accuracy(labels: Sequence[int], preds: Sequence[int]) -> float:
    labels = np.asarray(labels)
    preds = np.asarray(preds)
    return float((labels == preds).mean())


def evaluate_prediction_csv(csv_path: str, metadata_path: str,
                            drop_no_face: bool = True) -> Dict[str, float]:
    """The ROC_AUC_ACC.py recipe: join `filename,label` fake-prob CSV with
    metadata.json ({name: {'label': 'REAL'|'FAKE'}}), drop the 0.5 no-face
    rows (`ROC_AUC_ACC.py:16`), compute accuracy and AUC."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    with open(metadata_path) as fh:
        meta = json.load(fh)

    rows = []
    for _, r in df.iterrows():
        name = r["filename"]
        entry = meta.get(name) or meta.get(name + ".mp4")
        if entry is None:
            continue
        prob = float(r["label"])
        if drop_no_face and prob == 0.5:
            continue
        truth = 1 if str(entry["label"]).upper() == "FAKE" else 0
        rows.append((truth, prob))
    if not rows:
        return {"accuracy": float("nan"), "auc": float("nan"), "count": 0,
                "note": "no scored rows joined the metadata"}
    y = np.array([r[0] for r in rows])
    p = np.array([r[1] for r in rows])
    acc = accuracy(y, (p >= 0.5).astype(int))
    out = {"accuracy": acc, "count": len(rows)}
    if len(np.unique(y)) < 2:
        # single-class y_true: sklearn's roc_curve warns and AUC is
        # meaningless — report NaN + an explicit note instead (mirrors
        # s3d_eval.py's all-skipped handling)
        out["auc"] = float("nan")
        out["note"] = ("AUC undefined: only one class present after the "
                       "metadata join/0.5-drop")
        return out
    try:
        _, _, _, auc = roc_auc(y, p)
    except ValueError:
        auc = float("nan")
    out["auc"] = float(auc)
    return out


def legacy_int_accuracy(csv_path: str, metadata_path: str) -> float:
    """The predictor's inverted int-label accuracy block
    (`cvit_prediction.py:363-369`, quirk ledger §8.4): prob<0.5 → 1 compared
    against integer labels. Kept behind this explicit function."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    with open(metadata_path) as fh:
        meta = json.load(fh)
    score = 0
    for _, r in df.iterrows():
        pred = 1 if float(r["label"]) < 0.5 else 0
        if pred == meta.get(r["filename"]):
            score += 1
    return score / max(len(df), 1)


def save_roc_curve(labels, scores, out_prefix: str, model_name: str = "model"):
    """ROC plot + fpr/tpr text dumps (`S3D-test.py:100-128`)."""
    fpr, tpr, thr, auc = roc_auc(labels, scores)
    np.savetxt(out_prefix + "_fpr.txt", fpr)
    np.savetxt(out_prefix + "_tpr.txt", tpr)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure()
        plt.plot(fpr, tpr, label=f"{model_name} (AUC {auc:.3f})")
        plt.plot([0, 1], [0, 1], "k--")
        plt.xlabel("FPR")
        plt.ylabel("TPR")
        plt.legend()
        plt.savefig(out_prefix + "_roc.png", dpi=120)
        plt.close()
    except Exception:
        pass
    return auc
