# Shape-prior VAE on NIH masks (reference scripts/source/vae_nih.bash).
# $1: device list (accepted for recipe compatibility; a no-op on TPU).
# Data root overridable: NIH_DATA_ROOT (default ../nih_data/numpy_data/).
python main_source.py vae_nih \
    -G $1 \
    --method vae_train \
    --train_list NIH_train \
    --val_list NIH_val \
    --data_root ${NIH_DATA_ROOT:-../nih_data/numpy_data/} \
    --val_data_root ${NIH_DATA_ROOT:-../nih_data/numpy_data/} \
    --data_path data/Multi_all.json \
    --eval_epoch 20 \
    --save_epoch 800 \
    --max_epoch 4800
