# Command templates mirroring reference shell/Template-shell.sh, adapted to
# this framework's CLI (same flags; --gpu_ids -1 forces CPU, multi-host via
# BBDM_MULTIHOST=1 — see docs/MIGRATION.md).

#train
python3 main.py --config configs/Template-LBBDM-f4.yaml --train --sample_at_start --save_top --gpu_ids 0 \
--resume_model path/to/model.ckpt --resume_optim path/to/optim.ckpt

#test
python3 main.py --config configs/Template-LBBDM-f4.yaml --sample_to_eval --gpu_ids 0 \
--resume_model path/to/model.ckpt --resume_optim path/to/optim.ckpt

#convert released reference weights (one-time; see also scripts/run_parity.py
#for the full convert -> sample -> metric-delta protocol)
#python3 scripts/convert_checkpoint.py bbdm -c configs/Template-LBBDM-f4.yaml -i last_model.pth -o last_model.ckpt
#python3 scripts/convert_checkpoint.py vqgan -i vqgan.pth -o vqgan.ckpt
#python3 scripts/convert_checkpoint.py vqgan-train -i vqgan.pth -o vqgan_train.ckpt --lpips-out lpips_vgg.ckpt

#preprocess and evaluation
## rename
#python3 preprocess_and_evaluation.py -f rename_samples -r root/dir -s source/dir -t target/dir

## copy
#python3 preprocess_and_evaluation.py -f copy_samples -r root/dir -s source/dir -t target/dir

## LPIPS
#python3 preprocess_and_evaluation.py -f LPIPS -s source/dir -t target/dir -n 1

## max_min_LPIPS
#python3 preprocess_and_evaluation.py -f max_min_LPIPS -s source/dir -t target/dir -n 1

## diversity
#python3 preprocess_and_evaluation.py -f diversity -s source/dir -n 1

## fidelity (in-framework FID port; the reference shells out to `fidelity`)
#python3 preprocess_and_evaluation.py -f FID -s path1 -t path2

## PSNR/SSIM (weights-free)
#python3 preprocess_and_evaluation.py -f psnr_ssim -s source/dir -t target/dir
