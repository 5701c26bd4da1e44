#include "monerf/client.h"

#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <cerrno>
#include <cstring>
#include <stdexcept>

namespace monerf {

RuntimeClient::RuntimeClient(const std::string& socket_path) {
  fd_ = ::socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd_ < 0) throw std::runtime_error("socket(): " + std::string(strerror(errno)));
  sockaddr_un addr{};
  addr.sun_family = AF_UNIX;
  if (socket_path.size() >= sizeof(addr.sun_path))
    throw std::runtime_error("socket path too long");
  std::strncpy(addr.sun_path, socket_path.c_str(), sizeof(addr.sun_path) - 1);
  if (::connect(fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    ::close(fd_);
    throw std::runtime_error("connect(" + socket_path +
                             "): " + std::string(strerror(errno)));
  }
}

RuntimeClient::~RuntimeClient() {
  if (fd_ >= 0) ::close(fd_);
}

void RuntimeClient::send_all(const void* p, size_t n) {
  const auto* b = static_cast<const uint8_t*>(p);
  while (n > 0) {
    ssize_t k = ::send(fd_, b, n, 0);
    if (k <= 0) throw std::runtime_error("send(): " + std::string(strerror(errno)));
    b += k;
    n -= static_cast<size_t>(k);
  }
}

void RuntimeClient::recv_all(void* p, size_t n) {
  auto* b = static_cast<uint8_t*>(p);
  while (n > 0) {
    ssize_t k = ::recv(fd_, b, n, 0);
    if (k <= 0) throw std::runtime_error("recv(): peer closed");
    b += k;
    n -= static_cast<size_t>(k);
  }
}

Reader RuntimeClient::call(Op op, const Writer& w) {
  std::lock_guard<std::mutex> lock(mu_);
  uint32_t head[2] = {static_cast<uint32_t>(op),
                      static_cast<uint32_t>(w.data().size())};
  send_all(head, sizeof(head));
  if (!w.data().empty()) send_all(w.data().data(), w.data().size());

  uint32_t reply_head[2];
  recv_all(reply_head, sizeof(reply_head));
  std::vector<uint8_t> payload(reply_head[1]);
  if (reply_head[1] > 0) recv_all(payload.data(), payload.size());
  if (reply_head[0] != 0) {
    throw std::runtime_error(
        "runtime error: " +
        std::string(payload.begin(), payload.end()));
  }
  return Reader(std::move(payload));
}

}  // namespace monerf
