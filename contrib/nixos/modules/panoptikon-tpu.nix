# services.panoptikon-tpu — NixOS module for the TPU-native server.
#
# Counterpart of the reference's contrib/nixos/modules/panoptikon.nix,
# re-thought for TPU VMs: there is no CUDA/ROCm package matrix — the one
# accelerator knob is the JAX platform (tpu on a TPU VM, cpu elsewhere),
# selected via JAX_PLATFORMS. The service runs `panoptikon-tpu serve
# --root <stateDir>` as a hardened systemd unit (mirrors
# deploy/systemd/panoptikon-tpu.service).
{
  config,
  lib,
  pkgs,
  ...
}: let
  cfg = config.services.panoptikon-tpu;
  inherit (lib) mkEnableOption mkOption mkIf types;

  isLoopback = host:
    host == "localhost" || host == "::1" || lib.hasPrefix "127." host;

  pythonEnv = cfg.package;
in {
  options.services.panoptikon-tpu = {
    enable = mkEnableOption "Panoptikon TPU multimodal media search server";

    package = mkOption {
      type = types.package;
      description = ''
        Python environment providing the `panoptikon-tpu` entry point
        (e.g. `python3.withPackages (ps: [ps.panoptikon-tpu])` or a
        venv-style derivation with jax[tpu] for TPU VMs).
      '';
    };

    stateDir = mkOption {
      type = types.path;
      default = "/var/lib/panoptikon-tpu";
      description = "Server root: databases, config, .env (`--root`).";
    };

    host = mkOption {
      type = types.str;
      default = "127.0.0.1";
      description = "Listener bind address.";
    };

    port = mkOption {
      type = types.port;
      default = 6342;
      description = "Listener port.";
    };

    platform = mkOption {
      type = types.enum ["tpu" "cpu"];
      default = "tpu";
      description = ''
        JAX platform. `tpu` on a TPU VM (libtpu present); `cpu` runs the
        full server with XLA:CPU — same code paths, no accelerator.
      '';
    };

    configFile = mkOption {
      type = types.nullOr types.path;
      default = null;
      description = ''
        Server TOML passed as `--config`. When null, the first run
        materializes `config/server/default.toml` under
        {option}`stateDir` (`panoptikon-tpu setup` semantics) and serve
        uses {option}`host`/{option}`port`.
      '';
    };

    mediaDirs = mkOption {
      type = types.listOf types.path;
      default = [];
      description = ''
        Read-only media roots granted to the sandbox (ReadOnlyPaths).
        Folders still have to be registered via
        `PUT /api/jobs/folders` or the setup wizard.
      '';
    };

    environment = mkOption {
      type = types.attrsOf types.str;
      default = {};
      description = "Extra environment (external inputs, XLA flags).";
    };

    openFirewall = mkOption {
      type = types.bool;
      default = false;
      description = "Open the listener port (non-loopback binds only).";
    };
  };

  config = mkIf cfg.enable {
    assertions = [
      {
        assertion = cfg.openFirewall -> !(isLoopback cfg.host);
        message = "services.panoptikon-tpu.openFirewall is pointless on a loopback bind";
      }
    ];

    users.users.panoptikon-tpu = {
      isSystemUser = true;
      group = "panoptikon-tpu";
      home = cfg.stateDir;
    };
    users.groups.panoptikon-tpu = {};

    systemd.services.panoptikon-tpu = {
      description = "Panoptikon TPU media search server";
      wantedBy = ["multi-user.target"];
      after = ["network-online.target"];
      wants = ["network-online.target"];

      environment =
        {
          JAX_PLATFORMS = cfg.platform;
          # One compilation cache across restarts — first compile of each
          # program geometry is the expensive part on TPU.
          JAX_COMPILATION_CACHE_DIR = "${cfg.stateDir}/jax-cache";
        }
        // cfg.environment;

      serviceConfig = {
        ExecStart = lib.concatStringsSep " " ([
            "${pythonEnv}/bin/panoptikon-tpu"
            "serve"
            "--root"
            (toString cfg.stateDir)
          ]
          ++ (
            if cfg.configFile != null
            then ["--config" (toString cfg.configFile)]
            else ["--host" cfg.host "--port" (toString cfg.port)]
          ));
        User = "panoptikon-tpu";
        Group = "panoptikon-tpu";
        StateDirectory = "panoptikon-tpu";
        WorkingDirectory = cfg.stateDir;
        Restart = "on-failure";
        RestartSec = 5;

        # Hardening (deploy/systemd twin): the service only needs its
        # state dir, the media roots, and — on TPU VMs — the accelerator
        # device nodes.
        NoNewPrivileges = true;
        ProtectSystem = "strict";
        ProtectHome = true;
        ReadWritePaths = [cfg.stateDir];
        ReadOnlyPaths = cfg.mediaDirs;
        PrivateTmp = true;
        ProtectKernelTunables = true;
        ProtectControlGroups = true;
        RestrictSUIDSGID = true;
        # libtpu drives the chip through /dev/accel* and vfio.
        DeviceAllow = lib.optionals (cfg.platform == "tpu") [
          "char-accel rw"
          "/dev/vfio/vfio rw"
        ];
        PrivateDevices = cfg.platform != "tpu";
      };
    };

    networking.firewall.allowedTCPPorts =
      lib.optionals cfg.openFirewall [cfg.port];
  };
}
