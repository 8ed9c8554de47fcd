# Source-domain segmentation U-Net on NIH (reference scripts/source/seg_nih.bash).
python main_source.py seg_nih \
    -G $1 \
    --method seg_train \
    --train_list NIH_train \
    --val_list NIH_val \
    --data_root ${NIH_DATA_ROOT:-../nih_data/numpy_data/} \
    --val_data_root ${NIH_DATA_ROOT:-../nih_data/numpy_data/} \
    --data_path data/Multi_all.json \
    --eval_epoch 20 \
    --save_epoch 800 \
    --max_epoch 2400
