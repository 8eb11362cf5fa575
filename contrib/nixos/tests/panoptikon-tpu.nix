# NixOS VM test: the module boots the server on XLA:CPU and the HTTP
# surface answers (counterpart of contrib/nixos/tests/panoptikon.nix).
# Run with: nix build .#checks.x86_64-linux.panoptikon-tpu (in a flake
# exposing this test) or `nixos-test` tooling.
{
  pkgs,
  panoptikon-tpu-env,
  ...
}:
pkgs.nixosTest {
  name = "panoptikon-tpu";

  nodes.machine = {...}: {
    imports = [../modules/panoptikon-tpu.nix];
    services.panoptikon-tpu = {
      enable = true;
      package = panoptikon-tpu-env;
      platform = "cpu"; # no TPU in the test VM; same server code paths
      host = "127.0.0.1";
      port = 6342;
    };
    # First compile of the tiny fixture programs on 1 vCPU is slow.
    virtualisation.cores = 2;
    virtualisation.memorySize = 4096;
  };

  testScript = ''
    machine.wait_for_unit("panoptikon-tpu.service")
    machine.wait_for_open_port(6342)
    machine.succeed(
        "curl -sf http://127.0.0.1:6342/health | grep -q registry_ok"
    )
    machine.succeed(
        "curl -sf -XPOST http://127.0.0.1:6342/api/search/pql"
        " -H 'content-type: application/json' -d '{\"page_size\": 1}'"
        " | grep -q results"
    )
    # State lives under the hardened StateDirectory.
    machine.succeed("test -d /var/lib/panoptikon-tpu")
  '';
}
