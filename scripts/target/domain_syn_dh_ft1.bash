# NIH->SYN teacher-student domain adaptation (reference scripts/target/domain_syn_dh_ft1.bash;
# the domain_syn/domain_syn_pseudo prefix reuse mirrors the reference's quirk).
python main_target.py domain_syn_dh_ft1 \
    -G $1 \
    --method domain_adaptation \
    --load_prefix seg_nih \
    --load_prefix_vae vae_nih \
    --train_list SYN_train \
    --val_list SYN_val \
    --data_root ${SYN_DATA_ROOT:-../nih_data/numpy_data/} \
    --val_data_root ${SYN_DATA_ROOT:-../nih_data/numpy_data/} \
    --data_path data/Multi_all.json \
    --pan_index 11 \
    --lambda_vae 0.1 \
    --domain_loss_type 8 --val_finetune 1 \
    --eval_epoch 1 \
    --save_epoch 100 \
    --max_epoch 50
