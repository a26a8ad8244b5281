"""TimeSformer — divided space-time attention ViT (placeholder).

Full implementation lands in a later milestone; parity targets:
slowfast/models/timesformer.py + tome/patch/timesformer.py
(per-frame spatial merging with CLS detach/reattach).
"""
