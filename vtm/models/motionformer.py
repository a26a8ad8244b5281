"""Motionformer — trajectory-attention ViT (placeholder).

Full implementation lands in a later milestone; parity targets:
slowfast/models/motionformer_video_model_builder.py +
motionformer_vit_helper.py + tome/patch/motionformer.py.
"""
