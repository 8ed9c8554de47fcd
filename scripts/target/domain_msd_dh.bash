# NIH->MSD teacher-student domain adaptation (reference scripts/target/domain_msd_dh.bash;
# the domain_syn/domain_syn_pseudo prefix reuse mirrors the reference's quirk).
python main_target.py domain_msd_dh \
    -G $1 \
    --method domain_adaptation \
    --load_prefix seg_nih \
    --load_prefix_vae vae_nih \
    --train_list MSD_train \
    --val_list MSD_val \
    --data_root ${MSD_DATA_ROOT:-../nih_data/numpy_data/} \
    --val_data_root ${MSD_DATA_ROOT:-../nih_data/numpy_data/} \
    --data_path data/Multi_all.json \
    --pan_index 10 \
    --lambda_vae 1.0 \
    --domain_loss_type 8 \
    --eval_epoch 2 \
    --save_epoch 100 \
    --max_epoch 50
