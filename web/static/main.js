/* Demo frontend logic (role of the reference's web/static/js/main.js +
 * siriwave.js, original implementation).
 *
 * Flow: POST-free — GET /generate?text=&speaker_id= returns a WAV blob
 * (server caches by md5(text)); the blob is decoded with WebAudio and drawn
 * as a min/max amplitude envelope on a canvas, with an animated playhead and
 * a level-reactive pulse while playing.
 */

(function () {
  "use strict";

  var canvas = document.getElementById("wave");
  var ctx = canvas.getContext("2d");
  var statusEl = document.getElementById("status");
  var button = document.getElementById("synthesize");
  var textEl = document.getElementById("text");
  var speakerEl = document.getElementById("speaker");

  var audioCtx = null;
  var buffer = null;      // decoded AudioBuffer
  var source = null;      // currently playing source
  var playStart = 0;      // audioCtx.currentTime at playback start
  var envelope = null;    // [ [min, max], ... ] per pixel column

  function setStatus(msg, isError) {
    statusEl.textContent = msg || "";
    statusEl.className = "status" + (isError ? " error" : "");
  }

  function computeEnvelope(audioBuffer, columns) {
    var data = audioBuffer.getChannelData(0);
    var perCol = Math.max(1, Math.floor(data.length / columns));
    var env = [];
    for (var c = 0; c < columns; c++) {
      var lo = 0, hi = 0;
      var start = c * perCol;
      var end = Math.min(data.length, start + perCol);
      for (var i = start; i < end; i++) {
        if (data[i] < lo) lo = data[i];
        if (data[i] > hi) hi = data[i];
      }
      env.push([lo, hi]);
    }
    return env;
  }

  function draw(progress, level) {
    var w = canvas.width, h = canvas.height, mid = h / 2;
    ctx.clearRect(0, 0, w, h);
    if (!envelope) {
      ctx.strokeStyle = "#2a323e";
      ctx.beginPath();
      ctx.moveTo(0, mid);
      ctx.lineTo(w, mid);
      ctx.stroke();
      return;
    }
    var cols = envelope.length;
    var colW = w / cols;
    var boost = 1 + 0.6 * (level || 0);
    for (var c = 0; c < cols; c++) {
      var played = progress !== null && c / cols <= progress;
      ctx.fillStyle = played ? "#53e6b7" : "#4da3ff";
      var y0 = mid + envelope[c][0] * mid * 0.92 * boost;
      var y1 = mid + envelope[c][1] * mid * 0.92 * boost;
      ctx.fillRect(c * colW, Math.min(y0, y1),
                   Math.max(1, colW - 1), Math.max(1, Math.abs(y1 - y0)));
    }
    if (progress !== null) {
      ctx.fillStyle = "#e7ecf3";
      ctx.fillRect(progress * w - 1, 0, 2, h);
    }
  }

  function animate() {
    if (!source || !buffer) return;
    var t = audioCtx.currentTime - playStart;
    var progress = Math.min(1, t / buffer.duration);
    // coarse instantaneous level from the envelope at the playhead
    var idx = Math.min(envelope.length - 1,
                       Math.floor(progress * envelope.length));
    var level = envelope[idx] ? envelope[idx][1] - envelope[idx][0] : 0;
    draw(progress, level);
    if (progress < 1) {
      requestAnimationFrame(animate);
    } else {
      source = null;
      draw(1, 0);
      setStatus("done");
    }
  }

  function play() {
    if (!buffer) return;
    if (source) { try { source.stop(); } catch (e) {} }
    source = audioCtx.createBufferSource();
    source.buffer = buffer;
    source.connect(audioCtx.destination);
    playStart = audioCtx.currentTime;
    source.start();
    requestAnimationFrame(animate);
  }

  function synthesize() {
    var text = textEl.value.trim();
    if (!text) { setStatus("enter a sentence first", true); return; }
    button.disabled = true;
    setStatus("generating…");
    var url = "/generate?text=" + encodeURIComponent(text) +
              "&speaker_id=" + encodeURIComponent(speakerEl.value || "0");
    fetch(url, { cache: "no-cache" })
      .then(function (res) {
        if (!res.ok) {
          return res.json().then(function (body) {
            throw new Error(body.error || res.statusText);
          });
        }
        return res.arrayBuffer();
      })
      .then(function (bytes) {
        if (!audioCtx) {
          audioCtx = new (window.AudioContext || window.webkitAudioContext)();
        }
        return audioCtx.decodeAudioData(bytes);
      })
      .then(function (decoded) {
        buffer = decoded;
        envelope = computeEnvelope(decoded, Math.floor(canvas.width / 3));
        setStatus("playing (" + decoded.duration.toFixed(1) + " s)");
        play();
      })
      .catch(function (err) { setStatus(String(err.message || err), true); })
      .then(function () { button.disabled = false; });
  }

  function loadInfo() {
    fetch("/api/info").then(function (r) { return r.json(); })
      .then(function (info) {
        document.getElementById("model").textContent =
          "model: " + info.model + " · speakers: " + info.num_speakers;
        speakerEl.innerHTML = "";
        for (var i = 0; i < Math.max(1, info.num_speakers); i++) {
          var opt = document.createElement("option");
          opt.value = i;
          opt.textContent = "speaker " + i;
          speakerEl.appendChild(opt);
        }
      })
      .catch(function () {});
  }

  button.addEventListener("click", synthesize);
  textEl.addEventListener("keydown", function (e) {
    if (e.key === "Enter" && !e.shiftKey) { e.preventDefault(); synthesize(); }
  });

  draw(null, 0);
  loadInfo();
})();
