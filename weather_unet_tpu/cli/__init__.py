"""Command-line entry points with reference flag parity.

Run as ``python -m weather_unet_tpu.cli.<name>``:

Training:    train_transfer_est, train_transfer_cls, train_classifier,
             train_estimator
Inference:   demo, inf_transfer_c, inf_transfer_e, inf_1year_signals,
             inf_classifier_i2w, serve (HTTP micro-batching server)
Evaluation:  eval_class_transfer, eval_estimator_transfer,
             eval_classifier_i2w, eval_estimator, fid_score, inception_score
Tooling:     preprocess, pkl_viewer, plot_signals, write_image_summary,
             convert_checkpoint
"""
