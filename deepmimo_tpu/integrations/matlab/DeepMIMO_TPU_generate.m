function [channels, info] = DeepMIMO_TPU_generate(scenario_folder, params)
% DEEPMIMO_TPU_GENERATE  MIMO channels from an exported deepmimo_tpu scenario.
%
%   [channels, info] = DeepMIMO_TPU_generate(folder, params)
%
% Consumes the folder written by deepmimo_tpu.integrations.export_matlab
% (params.mat, BS{i}_UE_{a}-{b}.mat path chunks, BS{i}_BS.mat, and
% UE_locations.mat) and synthesizes channels with the same math as the
% deepmimo_tpu renderer (capability parity with the reference's vendored
% MATLAB generator, reference deepmimo/integrations/matlab/DeepMIMO-matlab/;
% fresh implementation validated against tests/oracle.py formulas).
%
% params: struct from default_params(), fields documented there.
%
% Returns:
%   channels: {num_BS x 1} cell; channels{b} is [n_ue x 1] cell of
%     [R x T x K] (freq domain) or [R x T x L] (time domain) complex
%     channels. With params.enable_doppler, a 4th dim of
%     numel(params.doppler_times) snapshots is added.
%   info: struct with BS/UE locations and per-user path counts.

if nargin < 2, params = default_params(); end

meta = load(fullfile(scenario_folder, 'params.mat'));
num_bs = double(meta.num_BS);
tx_power = double(meta.transmit_power);      % dBm re-reference (see exporter)
fc = double(meta.carrier_freq);
has_doppler = isfield(meta, 'doppler_available') && meta.doppler_available;

ue_loc = load(fullfile(scenario_folder, 'UE_locations.mat'));
info.ue_locations = ue_loc.UE_loc;
info.bs_locations = cell(num_bs, 1);
channels = cell(num_bs, 1);
info.num_paths = cell(num_bs, 1);

for b = 1:num_bs
    bs_file = load(fullfile(scenario_folder, sprintf('BS%d_BS.mat', b)));
    info.bs_locations{b} = bs_file.BS_loc;

    % Gather the user chunks in ascending start order.
    files = dir(fullfile(scenario_folder, sprintf('BS%d_UE_*.mat', b)));
    starts = zeros(numel(files), 1);
    for f = 1:numel(files)
        tok = sscanf(files(f).name, sprintf('BS%d_UE_%%d-%%d.mat', b));
        starts(f) = tok(1);
    end
    [~, order] = sort(starts);

    user_ch = {};
    n_paths = [];
    for f = order(:)'
        chunk = load(fullfile(scenario_folder, files(f).name));
        cells = chunk.channels;
        for u = 1:numel(cells)
            pm = cells{u};                   % [8 or 10 x n_paths]
            [h, np_used] = construct_channel(pm, tx_power, fc, ...
                                             has_doppler, params);
            user_ch{end+1, 1} = h;           %#ok<AGROW>
            n_paths(end+1, 1) = np_used;     %#ok<AGROW>
        end
    end
    channels{b} = user_ch;
    info.num_paths{b} = n_paths;
end
end
